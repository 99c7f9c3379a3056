from . import ciphers

__all__ = ["ciphers"]
