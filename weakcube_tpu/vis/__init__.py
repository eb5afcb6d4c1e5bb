from .logperf import print_ap_table  # noqa: F401
from .vis import draw_scene_view, draw_boxes_2d  # noqa: F401
