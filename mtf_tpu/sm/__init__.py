from mtf_tpu.sm.core import SearchMethod, SMParams, TrackerState  # noqa: F401
