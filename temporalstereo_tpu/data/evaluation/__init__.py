from .pixel_error import calc_error, do_evaluation, do_occlusion_evaluation
from .flow_error import calc_flow_error, do_flow_evaluation

__all__ = ["calc_error", "do_evaluation", "do_occlusion_evaluation",
           "calc_flow_error", "do_flow_evaluation"]
