from qcnn_tpu.utils.timing import StopWatch, TimerSet, timeit  # noqa: F401
