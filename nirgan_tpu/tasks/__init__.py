from nirgan_tpu.tasks.px2px import Px2PxTask

__all__ = ["Px2PxTask"]
