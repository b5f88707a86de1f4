"""mtf_tpu — TPU-native registration-based tracking framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the Modular
Tracking Framework (abhineet123/MTF, surveyed in /root/repo/SURVEY.md):
every tracker is the composition of a Search Method (optimizer/sampler), an
Appearance Model (differentiable similarity), and a State Space Model (warp
parameterization), constructible from the same string keys as the reference
factory (`include/mtf/mtf.h`).

Public entry points:
    create_tracker(sm, am, ssm, ilm, ...)   -- factory (mtf.h:929 analog)
    Tracker.initialize / update / get_region
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy factory import: keeps `import mtf_tpu.ops` cheap and avoids
    # circular imports during incremental construction.
    if name in ("create_tracker", "get_am", "get_ssm", "get_sm"):
        from mtf_tpu import factory
        return getattr(factory, name)
    raise AttributeError(name)
