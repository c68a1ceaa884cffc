import numpy as np, jax
from minipath_tpu.camera import Camera
from minipath_tpu.render.frame import render_frame_pallas
from minipath_tpu.render.pallas_kernels import prepare_scene
from minipath_tpu.utils.image import color_to_image, save_png
from tools.perf_sweep import load_cached_atrium

result = load_cached_atrium()
scene = prepare_scene(result.arrays)
W, H = 960, 540
cam = Camera().look_at((-16.0,4.0,0.0),(10.0,3.0,0.5)).f_number(8.0).sensor_width(36e-3)
img = render_frame_pallas(result.arrays, cam.build_sampler((W,H)), jax.random.key(1),
                          width=W, height=H, spp=16, stack_size=result.recommended_stack_size,
                          samples_per_packet=16, scene=scene)
save_png("/root/repo/.bench_cache/atrium.png", color_to_image(np.asarray(img)))
print("saved")
