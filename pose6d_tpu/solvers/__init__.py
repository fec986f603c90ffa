from .fmap2pointmap import (naive_fmap2pointmap,  # noqa: F401
                            spatial_filtering_fmap2pointmap)
from .kabsch import kabsch_umeyama  # noqa: F401
from .ransac import ransac_pose  # noqa: F401
from .icp import icp_cloud_to_model, icp_point2point  # noqa: F401
from .gnc import gnc_tls_pose  # noqa: F401
from .registry import choose_fmap2pointmap_solver, choose_pose_solver  # noqa: F401
from .multistart import disambiguate_pose, flip_hypotheses  # noqa: F401
from .multistart import disambiguate_pose_depth  # noqa: F401
from .verify_pose import depth_consistency_score  # noqa: F401
from .zoomout import zoomout_refine  # noqa: F401
