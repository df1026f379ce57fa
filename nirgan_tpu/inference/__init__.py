from nirgan_tpu.inference.histogram import histogram_match
from nirgan_tpu.inference.export import export_generator, load_exported, run_exported
from nirgan_tpu.inference.synthesize import synthesize_dataset
from nirgan_tpu.inference.scene import synthesize_scene

__all__ = ["histogram_match", "synthesize_dataset", "synthesize_scene",
           "export_generator", "load_exported", "run_exported"]
