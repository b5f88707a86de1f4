"""AM registry — reference factory keys (mtf.h:1196-1274).

Multichannel (`mc*`) variants are the same classes with n_channels=3
(the reference's 12 MC* subclasses collapse to a channel axis here,
SURVEY.md §2.2).
"""
from mtf_tpu.utils.excp import InvalidArgument
from mtf_tpu.am.base import AM, AMParams, AMState, IlluminationModel  # noqa: F401
from mtf_tpu.am.base import jacobian, gn_hessian, self_hessian  # noqa: F401
from mtf_tpu.am.ssd import SSD, NSSD, ZNCC, SAD
from mtf_tpu.am.ncc import NCC
from mtf_tpu.am.ssim import SSIM, SPSS
from mtf_tpu.am.info import MI, CCRE, KLD, LKLD
from mtf_tpu.am.scv import SCV, RSCV, LSCV, LRSCV
from mtf_tpu.am.misc import RIU, NGF, PCA, SumOfAMs  # noqa: F401
from mtf_tpu.am.dfm import DFM
from mtf_tpu.am.ilm import ILM_REGISTRY, GB, PGB, RBF  # noqa: F401

AM_REGISTRY = {
    "ssd": SSD, "nssd": NSSD, "zncc": ZNCC, "sad": SAD,
    "ncc": NCC, "ssim": SSIM, "spss": SPSS,
    "mi": MI, "ccre": CCRE, "kld": KLD, "lkld": LKLD,
    "scv": SCV, "rscv": RSCV, "lscv": LSCV, "lrscv": LRSCV,
    "riu": RIU, "ngf": NGF, "pca": PCA, "dfm": DFM,
}


def get_am(key: str, params: AMParams | None = None, ilm=None) -> AM:
    """Construct an AM from its reference factory key (mtf.h:1191-1274).

    `mc<key>` / `<key>3` aliases select 3-channel input, mirroring the
    reference's MC* classes.
    """
    k = key.lower()
    params = params or AMParams()
    if k == "sum":
        # composite AM (mtf.h:1232-1235): sub-AM keys from the sum_am1 /
        # sum_am2 parameters (modules.cfg defaults: ssd + ncc)
        am1 = get_am(str(params.extra.get("sum_am1", "ssd")), params, ilm)
        am2 = get_am(str(params.extra.get("sum_am2", "ncc")), params, ilm)
        return SumOfAMs(am1, am2)
    if k.startswith("mc") and k[2:] in AM_REGISTRY:
        from dataclasses import replace
        params = replace(params, n_channels=3)
        k = k[2:]
    elif k.endswith("3") and k[:-1] in AM_REGISTRY:
        from dataclasses import replace
        params = replace(params, n_channels=3)
        k = k[:-1]
    if k not in AM_REGISTRY:
        raise InvalidArgument(f"unknown AM {key!r}; known: {sorted(AM_REGISTRY)}")
    cls = AM_REGISTRY[k]
    if ilm is not None and isinstance(ilm, str):
        from mtf_tpu.am.ilm import ILM_REGISTRY
        ilm_cls = ILM_REGISTRY[ilm.lower()]
        if ilm.lower() in ("pgb", "rbf"):
            ilm = ilm_cls(params.resx, params.resy)
        else:
            ilm = ilm_cls()
    return cls(params, ilm)
