from nirgan_tpu.inference.histogram import histogram_match
from nirgan_tpu.inference.export import export_generator, load_exported, run_exported
from nirgan_tpu.inference.synthesize import synthesize_dataset

__all__ = ["histogram_match", "synthesize_dataset", "export_generator", "load_exported", "run_exported"]
