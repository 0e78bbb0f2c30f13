from volsurfs_tpu.models import encodings, field_utils, fields, mlp

__all__ = ["encodings", "field_utils", "fields", "mlp"]
