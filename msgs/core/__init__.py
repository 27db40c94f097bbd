from msgs.core.camera import Camera, make_camera, fov2focal, focal2fov
from msgs.core.sh import eval_sh, rgb2sh, sh2rgb, num_sh_coeffs
from msgs.core.transforms import (
    quat_to_rotmat,
    build_scaling_rotation,
    build_covariance_3d,
    world_to_view,
    perspective_projection,
    inverse_sigmoid,
)
