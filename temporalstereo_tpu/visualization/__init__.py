from .colormap import colormap
from .disparity import disp_err_to_color, disp_err_to_colorbar, disp_to_color
from .flow import flow_err_to_color, flow_to_color

__all__ = ["colormap", "disp_to_color", "disp_err_to_color",
           "disp_err_to_colorbar", "flow_to_color", "flow_err_to_color"]
