from splatco_tpu.ops import losses, projection, sh  # noqa: F401
