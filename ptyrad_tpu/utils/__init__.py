from ptyrad_tpu.utils.logging import CustomLogger, vprint

__all__ = ["vprint", "CustomLogger"]
