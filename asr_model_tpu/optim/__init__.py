from asr_model_tpu.optim.maxfactor import maxfactor, bias_group_tree
from asr_model_tpu.optim.schedules import fam_scheduler2, fam_scheduler
