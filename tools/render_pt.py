#!/usr/bin/env python
"""Path-traced showcase render: atrium variant with materials, on TPU."""
import sys, time
import numpy as np, jax
from minipath_tpu.camera import Camera
from minipath_tpu.render.pallas_kernels import prepare_scene_pt
from minipath_tpu.render.wavefront import make_pt_tracer, render_frame_pt
from minipath_tpu.scene.bvh.build import build_bvh
from minipath_tpu.scene.materials import (Environment, dielectric, emissive,
                                          lambertian, material_table, metal)
from minipath_tpu.scene import procedural as proc
from minipath_tpu.utils.image import color_to_image, save_png

def build_material_scene():
    rng = np.random.default_rng(5)
    meshes, mats = [], []
    def add(mesh, mat_id):
        meshes.append(mesh)
        mats.append(np.full(mesh.triangle_count, mat_id, np.int32))
    # floor (checker-less gray lambertian)
    floor = proc.make_quad(60.0)
    p = floor.positions.copy()
    floor.positions = np.stack([p[:,0], p[:,2], p[:,1]], -1)
    add(floor, 0)
    # spheres with assorted materials
    mat_defs = [
        lambertian((0.6, 0.6, 0.6)),      # 0 floor
        lambertian((0.8, 0.3, 0.25)),     # 1 red
        metal((0.9, 0.9, 0.95), 0.02),    # 2 mirror
        metal((0.9, 0.7, 0.3), 0.25),     # 3 gold rough
        dielectric(1.5),                  # 4 glass
        lambertian((0.25, 0.45, 0.85)),   # 5 blue
        emissive((1.0, 0.9, 0.7), 14.0),  # 6 lamp
    ]
    add(proc.make_uv_sphere(1.0, (-2.4, 1.0, 0.0), 32, 64), 1)
    add(proc.make_uv_sphere(1.0, (0.0, 1.0, 0.0), 32, 64), 2)
    add(proc.make_uv_sphere(1.0, (2.4, 1.0, 0.0), 32, 64), 4)
    add(proc.make_uv_sphere(0.7, (-1.2, 0.7, 2.0), 24, 48), 3)
    add(proc.make_uv_sphere(0.7, (1.2, 0.7, 2.0), 24, 48), 5)
    add(proc.make_uv_sphere(0.8, (0.0, 5.0, 1.0), 16, 32), 6)  # lamp overhead
    for _ in range(40):
        c = (rng.uniform(-8,8), 0.25, rng.uniform(-4,6))
        add(proc.make_uv_sphere(0.25, c, 10, 20), int(rng.integers(1, 6)))
    mesh = proc.merge_meshes(meshes)
    return mesh, np.concatenate(mats), material_table(mat_defs)

W, H, SPP = 960, 540, int(sys.argv[1]) if len(sys.argv) > 1 else 64
mesh, mat_ids, table = build_material_scene()
res = build_bvh(mesh, materials=mat_ids)
scene = prepare_scene_pt(res.as_device())
tracer, tracer_state = make_pt_tracer(scene, stack_size=res.recommended_stack_size, packet_size=2048)
cam = Camera().look_at((0.0, 2.2, 7.5), (0.0, 1.0, 0.0)).f_number(8.0).sensor_width(36e-3)
t0=time.time()
img = render_frame_pt(tracer, tracer_state, table, cam.build_sampler((W,H)), jax.random.key(0),
                      width=W, height=H, spp=SPP, bounces=6, env=Environment.sky(),
                      px_block=(16,16), samples_per_packet=8)
a = np.asarray(img)
print(f"render {W}x{H}@{SPP}spp 6 bounces: {time.time()-t0:.1f}s (incl compile)")
# simple gamma for display
a2 = a.copy(); a2[...,:3] = np.clip(a[...,:3], 0, 1) ** (1/2.2)
save_png("/root/repo/.bench_cache/pt_showcase.png", color_to_image(a2))
print("saved .bench_cache/pt_showcase.png")
