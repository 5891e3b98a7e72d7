from asr_model_tpu.ops.audio import sinusoids, frame_rate_waveform
from asr_model_tpu.ops.mel import log_mel_spectrogram, mel_filterbank
