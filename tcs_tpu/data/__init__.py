from tcs_tpu.data import frame_utils  # noqa: F401
from tcs_tpu.data.datasets import (  # noqa: F401
    KITTI,
    KITTIraw,
    SceneFlowDatasets,
    StereoSequenceDataset,
    TartanAir,
    fetch_dataset,
)
from tcs_tpu.data.loader import SequenceLoader  # noqa: F401
