from tcs_tpu.models.tc_stereo import (  # noqa: F401
    CameraParams,
    TCSFeatureEncoder,
    TCStereo,
    TemporalState,
)
