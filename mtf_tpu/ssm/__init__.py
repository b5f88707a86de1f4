from mtf_tpu.utils.excp import InvalidArgument
from mtf_tpu.ssm.base import SSM  # noqa: F401
from mtf_tpu.ssm.projective import SSM_REGISTRY  # noqa: F401


def get_ssm(key: str, **kwargs) -> SSM:
    """Construct an SSM from its reference factory key (mtf.h:1066-1100).

    kwargs pass through to the SSM constructor (spline control grid /
    overlap / interp_type, TPS anchors — SplineParams analogs)."""
    k = key.lower()
    reg = dict(SSM_REGISTRY)
    try:
        from mtf_tpu.ssm.spline import SPLINE_REGISTRY
        reg.update(SPLINE_REGISTRY)
    except ImportError:
        pass
    if k not in reg:
        raise InvalidArgument(f"unknown SSM {key!r}; known: {sorted(reg)}")
    return reg[k](**kwargs)
