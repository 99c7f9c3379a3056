from . import babyjubjub, mimc, oprf

__all__ = ["babyjubjub", "mimc", "oprf"]
