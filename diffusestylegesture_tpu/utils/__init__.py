from .profiling import (  # noqa: F401
    profile,
    profile_kv,
    profile_means,
    reset_profile,
    trace_capture,
)
