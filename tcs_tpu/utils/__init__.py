from tcs_tpu.utils.padder import InputPadder  # noqa: F401
