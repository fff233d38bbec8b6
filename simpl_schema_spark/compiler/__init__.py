from .compile import RuleCompiler, compile_violations, spark_rule, violation  # noqa: F401
from .regex import js_regex_repr, to_java_regex  # noqa: F401
