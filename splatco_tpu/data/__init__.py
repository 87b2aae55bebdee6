from splatco_tpu.data.cameras import Camera  # noqa: F401
