from qcnn_tpu.utils.timing import StopWatch, TimerSet  # noqa: F401
