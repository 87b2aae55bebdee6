from splatco_tpu.utils import math as math_utils  # noqa: F401
