from asr_model_tpu.train.metrics import levenshtein, wer_batch, compute_metrics
