"""fast3r_tpu — a TPU-native (JAX/XLA/Pallas) Fast3R framework.

Public API mirroring the reference (README.md:75-131):

    from fast3r_tpu import Fast3R, load_images, inference

    model = Fast3R.from_pretrained("/path/to/hf_checkpoint")
    images = load_images(filelist, size=512)
    output = inference(images, model)
    preds = output["preds"]   # pts3d_in_other_view / conf / pts3d_local / conf_local

    from fast3r_tpu import estimate_camera_poses
    poses_c2w, focals = estimate_camera_poses(preds)
"""

from fast3r_tpu.eval.pose import estimate_camera_poses  # noqa: F401
from fast3r_tpu.eval.recon import align_local_pts3d_to_global  # noqa: F401
from fast3r_tpu.inference import Fast3R, inference  # noqa: F401
from fast3r_tpu.models.fast3r import (  # noqa: F401
    Fast3RConfig,
    fast3r_forward,
    init_fast3r,
)
from fast3r_tpu.utils.image import load_images  # noqa: F401

__version__ = "0.1.0"
