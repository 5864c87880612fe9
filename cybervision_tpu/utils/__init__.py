from cybervision_tpu.utils.progress import PhaseTimer, ProgressBar, ProgressListener

__all__ = ["PhaseTimer", "ProgressBar", "ProgressListener"]
