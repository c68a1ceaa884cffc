#!/usr/bin/env python
"""SAH tree-quality metric: expected traversal cost per random ray."""
import sys
import numpy as np
from minipath_tpu.scene.bvh import links as L

def sa(lo, hi):
    s = np.maximum(hi - lo, 0.0)
    return 2.0 * (s[...,0]*(s[...,1]+s[...,2]) + s[...,1]*s[...,2])

def tree_cost(arrays):
    """Expected node visits + tri tests per ray hitting the root box."""
    root_sa = sa(arrays.bbox_min, arrays.bbox_max)
    links = arrays.node_child_links
    lo, hi = arrays.node_child_box_min, arrays.node_child_box_max
    c_inner = 0.0
    c_tri = 0.0
    for n in range(links.shape[0]):
        for c in range(8):
            lk = int(links[n, c])
            if lk == -8:
                continue
            area = sa(lo[n, c], hi[n, c]) / root_sa
            if L.is_leaf(lk):
                c_tri += area * L.decode_count(lk) * 8  # MT tests (padded)
                c_inner += area * L.decode_count(lk)    # leaf pops
            else:
                c_inner += area * 8  # box tests at this child
    return c_inner, c_tri

if __name__ == "__main__":
    from minipath_tpu.scene.bvh.build import build_bvh
    from minipath_tpu.scene.bvh import native
    from minipath_tpu.scene.procedural import make_atrium

    mesh = make_atrium(250_000)
    for name, res in [
        ("native-24", native.build_bvh_native(mesh, leaf_max=24)),
        ("python-24", build_bvh(mesh, leaf_max=24)),
    ]:
        ci, ct = tree_cost(res.arrays)
        print(f"{name}: E[box tests]={ci:.1f} E[tri tests]={ct:.1f} total~{ci+ct:.1f}", flush=True)
