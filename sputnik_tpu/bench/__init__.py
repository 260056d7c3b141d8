from sputnik_tpu.bench import roofline

__all__ = ["roofline"]
