from handnet_tpu.eval.bop_pose import BOPEvaluator, vsd  # noqa: F401
from handnet_tpu.eval.coco_det import CocoDetEvaluator  # noqa: F401
from handnet_tpu.eval.grasp import GraspEvaluator, GraspScene  # noqa: F401
from handnet_tpu.eval.hpe import EvalUtil, HPEEvaluator  # noqa: F401
from handnet_tpu.eval.voc import voc_ap, voc_eval, voc_eval_hand  # noqa: F401
