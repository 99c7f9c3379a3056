from .limb import LimbField, Fp, Fr, BN254_P, BN254_R, int_to_limbs, limbs_to_int

__all__ = [
    "LimbField", "Fp", "Fr", "BN254_P", "BN254_R", "int_to_limbs", "limbs_to_int",
]
