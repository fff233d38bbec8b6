from .types import (  # noqa: F401
    AnyType,
    ArrayType,
    Binary,
    Boolean,
    DateType,
    Integer,
    Number,
    ObjectType,
    String,
    TypeToken,
)
from .definition import (  # noqa: F401
    SchemaValidationError,
    TypeGroup,
    expand_shorthand,
    key_ancestors,
    make_key_generic,
    oneOf,
)
from .humanize import humanize  # noqa: F401
from .schema import SimpleSchema  # noqa: F401
