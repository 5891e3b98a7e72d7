from asr_model_tpu.data.tokenizer import Tokenizer, setup_tokenizer
from asr_model_tpu.data.collator import DataCollator, collate
