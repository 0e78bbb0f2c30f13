from volsurfs_tpu.datasets import cameras, mvdataset, synthetic, tensor_reel

__all__ = ["cameras", "mvdataset", "synthetic", "tensor_reel"]
