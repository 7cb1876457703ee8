from libre_tpu.models.volume_scene import VolumeScene

__all__ = ["VolumeScene"]
