"""Measure the reference pipeline's cost on THIS host's CPU (torch).

BASELINE.md's north-star asks for >= 10x over the CPU reference, but the
reference publishes no numbers (README.md:1-7) and its committed code
cannot run end-to-end (SURVEY.md section 2.5.1 channel-count bug), so the
docs so far could only say "projects to minutes per mesh".  This script
replaces that projection with a measurement: it builds torch modules with
the reference's exact architecture shapes and evaluation batching, times
them on this host's CPU (the reference's default device,
/root/reference/run_recon.py:18  use_gpu=False), and combines the timings
with the query-point count the reference's own octree would evaluate on
the bench surface.

Nothing here is copied from the reference — the modules are built from
SURVEY.md's architecture table the same way the JAX package was; they
exist only to time reference-shaped compute with torch on CPU:

- coarse query (PIFuNetwNML.query, /root/reference/PIFuNetwNML.py:115-166):
  per 5k-point chunk (reconstruction.py:57), grid_sample into the
  [256,128,128] stacked-hourglass features per stack (4 stacks) + z-feat,
  MLP [257,1024,512,256,128,1] with skip-concat at res_layers (2,3,4).
- fine query (PIFuMRNet.query, /root/reference/PIFuMRNet.py:120-170):
  coarse query for preds+phi, then grid_sample into the full-res
  [16,512,512] local features and MLP [272,512,256,128,1] (res 1,2).
- encoders (one-time per mesh): 4-stack/256-ch hourglass at 512^2 x 12ch,
  netF+netB pix2pixHD GlobalGenerator(6->3, ngf64, 4 downs, 9 blocks) at
  512^2 (PIFuNetwNML.py:80-92), and the 1-stack/16-ch 'no_down' local
  hourglass at 1024^2 (PIFuMRNet.py:39-40).
- octree point count (mesh_util.py:124-187 eval_grid_octree): simulated
  exactly (init stride res/64, skip cells with max-min < 0.05, halve) on
  the bench capsule occupancy, counting newly evaluated lattice points.
- vertex fd-normal coloring (reconstruction.py:61, 50k-vert chunks;
  PIFuMRNet.calc_normal 4 forward taps): timed per chunk.

Excluded from the reference total (conservative — these only add to it):
marching_cubes_lewiner on the dense 512^3 volume, mesh IO, and the
~27k-transfer host<->device overhead the reference pays when a GPU IS
used (SURVEY.md section 6).

Run:  python scripts/reference_cpu_baseline.py [--resolution 512]
          [--tpu_secs_field 0.49] [--tpu_secs_mesh 1.66] [--quick]
Writes one JSON line; also appended to docs/PERFORMANCE.md by hand.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------- modules
def build_modules():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class ConvBlock(nn.Module):
        """Pre-activation residual block, reference Filter.py:12-69 shape:
        three 3x3 convs producing out/2 + out/4 + out/4 channels, concat,
        plus (1x1-projected) residual; group(32) norm."""

        def __init__(self, cin, cout):
            super().__init__()
            self.c1 = nn.Conv2d(cin, cout // 2, 3, padding=1, bias=False)
            self.c2 = nn.Conv2d(cout // 2, cout // 4, 3, padding=1,
                                bias=False)
            self.c3 = nn.Conv2d(cout // 4, cout // 4, 3, padding=1,
                                bias=False)
            def gn(ch):  # group(32) norm; small-ch variants fall back
                g = 32
                while ch % g:
                    g //= 2
                return nn.GroupNorm(g, ch)
            self.n1 = gn(cin)
            self.n2 = gn(cout // 2)
            self.n3 = gn(cout // 4)
            self.skip = (nn.Conv2d(cin, cout, 1, bias=False)
                         if cin != cout else None)

        def forward(self, x):
            y1 = self.c1(F.relu(self.n1(x)))
            y2 = self.c2(F.relu(self.n2(y1)))
            y3 = self.c3(F.relu(self.n3(y2)))
            out = torch.cat([y1, y2, y3], 1)
            return out + (self.skip(x) if self.skip is not None else x)

    class HourGlass(nn.Module):
        """Recursive hourglass (Filter.py:71-130): b1 top branch,
        avgpool -> b2 -> recurse -> b3, bicubic x2 upsample, sum."""

        def __init__(self, depth, ch):
            super().__init__()
            self.b1 = ConvBlock(ch, ch)
            self.b2 = ConvBlock(ch, ch)
            self.inner = (HourGlass(depth - 1, ch) if depth > 1
                          else ConvBlock(ch, ch))
            self.b3 = ConvBlock(ch, ch)

        def forward(self, x):
            import torch.nn.functional as F
            up = self.b1(x)
            low = self.b2(F.avg_pool2d(x, 2))
            low = self.b3(self.inner(low))
            return up + F.interpolate(low, scale_factor=2, mode="bicubic",
                                      align_corners=True)

    class Filter(nn.Module):
        """Stacked hourglass encoder (Filter.py:132-228 shape): 7x7/2 stem,
        down path, n_stack hourglasses with intermediate feature heads and
        feedback 1x1 convs."""

        def __init__(self, cin, n_stack, depth, ch, down):
            super().__init__()
            self.down = down
            self.stem = nn.Conv2d(cin, 64, 7, stride=2, padding=3)
            if down == "ave_pool":
                self.pre = nn.Sequential(ConvBlock(64, 128),
                                         nn.AvgPool2d(2), ConvBlock(128, 128),
                                         ConvBlock(128, ch))
            else:  # 'no_down': stem only (PIFuMRNet.py:39-40)
                self.pre = nn.Sequential(ConvBlock(64, 128),
                                         ConvBlock(128, 128),
                                         ConvBlock(128, ch))
            self.hgs = nn.ModuleList(HourGlass(depth, ch)
                                     for _ in range(n_stack))
            self.heads = nn.ModuleList(nn.Conv2d(ch, ch, 1)
                                       for _ in range(n_stack))
            self.feedback = nn.ModuleList(nn.Conv2d(ch, ch, 1)
                                          for _ in range(n_stack - 1))

        def forward(self, x):
            x = self.pre(self.stem(x))
            outs = []
            for i, hg in enumerate(self.hgs):
                y = hg(x)
                outs.append(self.heads[i](y))
                if i + 1 < len(self.hgs):
                    x = x + self.feedback[i](outs[-1])
            return outs

    class GlobalGenerator(nn.Module):
        """pix2pixHD netF/netB shape (networks.py:131-166): reflpad 7x7,
        n_down stride-2 convs, 9 resnet blocks, transposed-conv ups."""

        def __init__(self, cin=6, cout=3, ngf=64, n_down=4, n_blocks=9):
            super().__init__()
            layers = [nn.ReflectionPad2d(3), nn.Conv2d(cin, ngf, 7),
                      nn.InstanceNorm2d(ngf), nn.ReLU()]
            ch = ngf
            for _ in range(n_down):
                layers += [nn.Conv2d(ch, ch * 2, 3, stride=2, padding=1),
                           nn.InstanceNorm2d(ch * 2), nn.ReLU()]
                ch *= 2
            for _ in range(n_blocks):
                layers += [ResnetBlock(ch)]
            for _ in range(n_down):
                layers += [nn.ConvTranspose2d(ch, ch // 2, 3, stride=2,
                                              padding=1, output_padding=1),
                           nn.InstanceNorm2d(ch // 2), nn.ReLU()]
                ch //= 2
            layers += [nn.ReflectionPad2d(3), nn.Conv2d(ch, cout, 7),
                       nn.Tanh()]
            self.net = nn.Sequential(*layers)

        def forward(self, x):
            return self.net(x)

    class ResnetBlock(nn.Module):
        def __init__(self, ch):
            super().__init__()
            self.net = nn.Sequential(
                nn.ReflectionPad2d(1), nn.Conv2d(ch, ch, 3),
                nn.InstanceNorm2d(ch), nn.ReLU(),
                nn.ReflectionPad2d(1), nn.Conv2d(ch, ch, 3),
                nn.InstanceNorm2d(ch))

        def forward(self, x):
            return x + self.net(x)

    class MLP(nn.Module):
        """Conv1d(1x1) MLP over [B,C,N] with skip-concat of the input at
        res_layers and a captured phi at merge_layer (MLP.py:12-75)."""

        def __init__(self, dims, res_layers, merge_layer):
            super().__init__()
            self.res_layers = set(res_layers)
            self.merge_layer = merge_layer
            convs = []
            for i in range(len(dims) - 1):
                cin = dims[i] + (dims[0] if i in self.res_layers else 0)
                convs.append(nn.Conv1d(cin, dims[i + 1], 1))
            self.convs = nn.ModuleList(convs)

        def forward(self, x):
            import torch.nn.functional as F
            y, x0, phi = x, x, None
            for i, c in enumerate(self.convs):
                if i in self.res_layers:
                    y = torch.cat([y, x0], 1)
                y = c(y)
                if i + 1 < len(self.convs):
                    y = F.leaky_relu(y)
                if i == self.merge_layer:
                    phi = y
            return torch.sigmoid(y), phi

    return ConvBlock, HourGlass, Filter, GlobalGenerator, MLP


# ---------------------------------------------------- octree point count
def octree_point_count(resolution: int, occ_fn, threshold: float = 0.05):
    """Count lattice points the reference's eval_grid_octree evaluates
    (mesh_util.py:124-187): start at stride res/64, evaluate the (masked)
    lattice, keep cells whose 8-corner max-min >= threshold, halve the
    stride, repeat until stride 1.  A dropped cell's descendants are never
    re-examined.  Returns (total_points, per_level)."""
    res = resolution + 1  # corner lattice
    stride = max(1, resolution // 64)
    evaluated = np.zeros((res, res, res), bool)
    vals = np.zeros((res, res, res), np.float32)
    active = None  # live-cell mask over the CURRENT-stride cell grid
    per_level = []
    while True:
        n = resolution // stride  # cells per axis at this stride
        sub_eval = evaluated[::stride, ::stride, ::stride]
        sub_vals = vals[::stride, ::stride, ::stride]
        if active is None:
            need = np.ones((n + 1,) * 3, bool)
        else:  # corners of live cells (8-neighborhood dilation)
            need = np.zeros((n + 1,) * 3, bool)
            for s0 in (0, 1):
                for s1 in (0, 1):
                    for s2 in (0, 1):
                        need[s0:n + s0, s1:n + s1, s2:n + s2] |= active
        fresh = need & ~sub_eval
        pts = np.argwhere(fresh).astype(np.float32) * stride
        if len(pts):
            # NDC coords in [-1,1] like the bench grid
            sub_vals[fresh] = occ_fn(pts / (resolution / 2.0) - 1.0)
            sub_eval[fresh] = True
        per_level.append(int(fresh.sum()))
        if stride == 1:
            break
        g = sub_vals  # (n+1)^3 corner values; garbage only OUTSIDE live
        cmin = np.minimum.reduce([
            g[s0:n + s0, s1:n + s1, s2:n + s2]
            for s0 in (0, 1) for s1 in (0, 1) for s2 in (0, 1)])
        cmax = np.maximum.reduce([
            g[s0:n + s0, s1:n + s1, s2:n + s2]
            for s0 in (0, 1) for s1 in (0, 1) for s2 in (0, 1)])
        band = (cmax - cmin) >= threshold
        if active is not None:
            band &= active  # dropped parents stay dropped
        # children: each live cell splits 2x per axis at the next stride
        active = np.repeat(np.repeat(np.repeat(band, 2, 0), 2, 1), 2, 2)
        stride //= 2
    return int(sum(per_level)), per_level


def capsule_occ_np(pts):
    """The bench fallback surface (bench.py capsule_occ), NumPy."""
    dz = np.clip(np.abs(pts[:, 2]) - 0.5, 0.0, None)
    d = np.sqrt(pts[:, 0] ** 2 + pts[:, 1] ** 2 + dz ** 2)
    a = np.clip((0.36 - d) * 170.0, -60.0, 60.0)  # avoid exp overflow
    return 1.0 / (1.0 + np.exp(-a))


# ----------------------------------------------------------------- timing
def best_of(fn, n):
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--tpu_secs_field", type=float, default=0.49,
                    help="our measured encode+field-eval secs (bench.py)")
    ap.add_argument("--tpu_secs_mesh", type=float, default=1.66,
                    help="our measured full gen_mesh secs (bench.py)")
    ap.add_argument("--n_verts", type=int, default=1_320_000,
                    help="bench mesh vertex count (for coloring cost)")
    ap.add_argument("--quick", action="store_true",
                    help="1 repeat per timing instead of 3")
    args = ap.parse_args()

    import torch
    torch.set_num_threads(os.cpu_count() or 1)
    torch.set_grad_enabled(False)
    reps = 1 if args.quick else 3

    _, _, Filter, GlobalGenerator, MLP = build_modules()

    # --- octree workload (pure NumPy, fast)
    n_pts, per_level = octree_point_count(args.resolution, capsule_occ_np)
    n_chunks = -(-n_pts // 5000)  # reconstruction.py:57 num_samples=5000

    # --- per-chunk query cost
    feats_c = [torch.randn(1, 256, 128, 128) for _ in range(4)]
    feats_f = torch.randn(1, 16, 512, 512)
    mlp_c = MLP((257, 1024, 512, 256, 128, 1), (2, 3, 4), 2)
    mlp_f = MLP((272, 512, 256, 128, 1), (1, 2), -1)
    uv = torch.rand(1, 1, 5000, 2) * 2 - 1
    z = torch.randn(1, 1, 5000)

    def coarse_query():
        phi = None
        for f in feats_c:  # per-stack MLP pass, PIFuNetwNML.py:140-160
            samp = torch.nn.functional.grid_sample(
                f, uv, align_corners=True)[:, :, 0]
            x = torch.cat([samp, z], 1)
            _, phi = mlp_c(x)
        return phi

    def fine_query():
        phi = coarse_query()  # PIFuMRNet.query calls netG per chunk
        samp = torch.nn.functional.grid_sample(
            feats_f, uv, align_corners=True)[:, :, 0]
        x = torch.cat([samp, phi], 1)
        return mlp_f(x)

    t_chunk = best_of(fine_query, reps)

    # --- encoders (one-time per mesh)
    img_512 = torch.randn(1, 12, 512, 512)   # RGB-D + F/B normal maps
    img_6 = torch.randn(1, 6, 512, 512)
    img_1024 = torch.randn(1, 6 + 6, 1024, 1024)
    enc_c = Filter(12, 4, 2, 256, "ave_pool")
    enc_f = Filter(12, 1, 2, 16, "no_down")
    netF = GlobalGenerator()
    t_enc = best_of(lambda: enc_c(img_512), reps)
    t_enc += 2 * best_of(lambda: netF(img_6), reps)   # netF + netB
    t_enc += best_of(lambda: enc_f(img_1024), reps)

    # --- fd-normal coloring (reconstruction.py:58-67): 50k-vert chunks,
    # 4 forward taps per vert through the fine query
    uv_c = torch.rand(1, 1, 50000, 2) * 2 - 1
    z_c = torch.randn(1, 1, 50000)

    def color_chunk():
        for _ in range(4):
            samp = torch.nn.functional.grid_sample(
                feats_f, uv_c, align_corners=True)[:, :, 0]
            phi = torch.zeros(1, 256, 50000)
            mlp_f(torch.cat([samp, phi], 1))

    t_color_chunk = best_of(color_chunk, reps)
    n_color_chunks = -(-args.n_verts // 50000)

    ref_field = t_enc + n_chunks * t_chunk
    ref_color = n_color_chunks * t_color_chunk
    ref_mesh = ref_field + ref_color  # marching + IO excluded (see header)

    out = {
        "metric": "reference_cpu_secs_per_mesh",
        "host": f"{os.cpu_count()} cpu core(s)",
        "resolution": args.resolution,
        "octree_points": n_pts,
        "octree_points_per_level": per_level,
        "chunks_5k": n_chunks,
        "t_encoders_s": round(t_enc, 3),
        "t_chunk_5k_s": round(t_chunk, 4),
        "ref_field_path_s": round(ref_field, 2),
        "t_color_chunk_50k_s": round(t_color_chunk, 4),
        "ref_coloring_s": round(ref_color, 2),
        "ref_total_s_excl_marching_io": round(ref_mesh, 2),
        "tpu_field_path_s": args.tpu_secs_field,
        "tpu_mesh_s": args.tpu_secs_mesh,
        "speedup_field_path": round(ref_field / args.tpu_secs_field, 1),
        "speedup_full_mesh": round(ref_mesh / args.tpu_secs_mesh, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
