from nirgan_tpu.runtime.setup import setup_runtime

__all__ = ["setup_runtime"]
