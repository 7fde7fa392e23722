from selfcorr_tpu.losses.render_losses import (  # noqa: F401
    mask_pyramid_loss,
    texture_loss,
    depth_loss,
)
from selfcorr_tpu.losses.regularizers import (  # noqa: F401
    laplacian_loss,
    flatten_loss,
    symmetry_loss,
    pullfar_loss,
    deform_loss,
    camera_loss,
)
from selfcorr_tpu.losses.match_losses import (  # noqa: F401
    match_loss,
    imatch_loss,
    divide_by_frame,
    divide_by_instance,
    divide_by_both,
)
