from tcs_tpu.ops import sampler  # noqa: F401
from tcs_tpu.ops import splat  # noqa: F401
from tcs_tpu.ops import corr  # noqa: F401
