from handnet_tpu.eval.hpe import EvalUtil, HPEEvaluator  # noqa: F401
from handnet_tpu.eval.voc import voc_ap, voc_eval, voc_eval_hand  # noqa: F401
