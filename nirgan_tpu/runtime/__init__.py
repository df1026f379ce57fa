from nirgan_tpu.runtime.setup import default_compiler_options, setup_runtime

__all__ = ["setup_runtime", "default_compiler_options"]
