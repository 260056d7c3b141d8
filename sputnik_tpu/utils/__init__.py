from sputnik_tpu.utils import testing

__all__ = ["testing"]
