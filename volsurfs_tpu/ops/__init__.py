from volsurfs_tpu.ops import occupancy, raycast, samplers, samples, sh, volume_rendering

__all__ = [
    "occupancy",
    "raycast",
    "samplers",
    "samples",
    "sh",
    "volume_rendering",
]
