from .stats import column_profile, observe_validation_stats  # noqa: F401
from .uniqueness import (  # noqa: F401
    dedup_keep_first,
    duplicate_keys,
    duplicate_violations,
)
from .referential import (  # noqa: F401
    referential_violation_rows,
    referential_violations,
)
from .drift import (  # noqa: F401
    categorical_counts,
    categorical_drift,
    categorical_drift_psi,
    numeric_drift_ks,
    numeric_drift_psi,
    numeric_drift_ks_exact,
    numeric_quantile_profile,
)
from .vectors import (  # noqa: F401
    vector_violations,
    with_vector_violation,
)
from .schema_drift import schema_drift_violations  # noqa: F401
from .extraction import extraction_mismatches  # noqa: F401
from .histogram import histogram  # noqa: F401
