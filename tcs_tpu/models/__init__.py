from tcs_tpu.models.tc_stereo import TCStereo, TemporalState, CameraParams  # noqa: F401
