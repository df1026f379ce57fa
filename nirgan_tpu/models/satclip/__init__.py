from nirgan_tpu.models.satclip.location_encoder import LocationEncoder
from nirgan_tpu.models.satclip.wrapper import SatClipWrapper

__all__ = ["LocationEncoder", "SatClipWrapper"]
