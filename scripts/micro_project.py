"""TPU microbench: where do project_gaussians' ~3.5ms go?

Times the full projection, the no-SH variant (precomputed rgb), the
covariance chain alone (batched 3x3 matmuls), and a closed-form
elementwise covariance prototype."""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

W, H = 960, 540
N = 50_000


def timed(fn, *args, iters=30, warmup=3):
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3


def main():
    from scripts.profile_render import build_scene
    from hugs_tpu.render import make_camera
    from hugs_tpu.render.project import project_gaussians
    from hugs_tpu.ops.covariance import covariance_from_scaling_rotation
    from hugs_tpu.ops.sh import eval_sh_masked

    m, ls, q, ol, c = build_scene(N)
    cam = make_camera(jnp.eye(3), jnp.zeros(3), 0.9, 0.55)
    scales = jnp.exp(ls)
    qn = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    op = jax.nn.sigmoid(ol)
    rgb_pre = jnp.ones((N, 3)) * 0.5

    f_full = jax.jit(lambda: project_gaussians(m, scales, qn, op, c, cam,
                                               W, H, 3))
    print("project full     ", timed(f_full), "ms", flush=True)

    f_nosh = jax.jit(lambda: project_gaussians(m, scales, qn, op, rgb_pre,
                                               cam, W, H, 3))
    print("project noSH     ", timed(f_nosh), "ms", flush=True)

    f_cov = jax.jit(lambda: covariance_from_scaling_rotation(scales, qn))
    print("cov3d batched    ", timed(f_cov), "ms", flush=True)

    sh_cn = jnp.swapaxes(c, -1, -2)
    dirs = m / jnp.linalg.norm(m, axis=-1, keepdims=True)
    f_sh = jax.jit(lambda: eval_sh_masked(3, jnp.int32(3), sh_cn, dirs))
    print("sh eval (N,3,K)  ", timed(f_sh), "ms", flush=True)

    # SH in feature-major layout: (3, K, N)
    sh_t = jnp.transpose(c, (2, 1, 0))  # (3, K, N)
    d_t = dirs.T  # (3, N)

    def sh_fm():
        return eval_sh_masked(3, jnp.int32(3), sh_t, d_t.T[..., None].T[0].T
                              if False else d_t.T)
    # simpler: dirs broadcast (..., 3): use (3, N) channels w/ dirs (N, 3)?
    # eval_sh wants sh (..., C, K) & dirs (..., 3). Feature-major:
    # sh (C=3, K, N)? layout mismatch — emulate manually:
    x, y, z = d_t[0], d_t[1], d_t[2]

    def sh_manual(sh_t, x, y, z):
        # sh_t: (3, K, N); bands over K, all ops on (3, N) / (N,)
        r = 0.28209479177387814 * sh_t[:, 0]
        r = (r - 0.4886025119029199 * y * sh_t[:, 1]
             + 0.4886025119029199 * z * sh_t[:, 2]
             - 0.4886025119029199 * x * sh_t[:, 3])
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        r = (r + 1.0925484305920792 * xy * sh_t[:, 4]
             - 1.0925484305920792 * yz * sh_t[:, 5]
             + 0.31539156525252005 * (2 * zz - xx - yy) * sh_t[:, 6]
             - 1.0925484305920792 * xz * sh_t[:, 7]
             + 0.5462742152960396 * (xx - yy) * sh_t[:, 8])
        r = (r - 0.5900435899266435 * y * (3 * xx - yy) * sh_t[:, 9]
             + 2.890611442640554 * xy * z * sh_t[:, 10]
             - 0.4570457994644658 * y * (4 * zz - xx - yy) * sh_t[:, 11]
             + 0.3731763325901154 * z * (2 * zz - 3 * xx - 3 * yy) * sh_t[:, 12]
             - 0.4570457994644658 * x * (4 * zz - xx - yy) * sh_t[:, 13]
             + 1.445305721320277 * z * (xx - yy) * sh_t[:, 14]
             - 0.5900435899266435 * x * (xx - 3 * yy) * sh_t[:, 15])
        return r

    f_shm = jax.jit(lambda: sh_manual(sh_t, x, y, z))
    print("sh eval (3,K,N)  ", timed(f_shm), "ms", flush=True)

    # closed-form cov3d: 6 sym entries, elementwise over (N,)
    def cov6(scales, q):
        w, qx, qy, qz = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
        sx2, sy2, sz2 = scales[:, 0] ** 2, scales[:, 1] ** 2, scales[:, 2] ** 2
        r00 = 1 - 2 * (qy * qy + qz * qz)
        r01 = 2 * (qx * qy - w * qz)
        r02 = 2 * (qx * qz + w * qy)
        r10 = 2 * (qx * qy + w * qz)
        r11 = 1 - 2 * (qx * qx + qz * qz)
        r12 = 2 * (qy * qz - w * qx)
        r20 = 2 * (qx * qz - w * qy)
        r21 = 2 * (qy * qz + w * qx)
        r22 = 1 - 2 * (qx * qx + qy * qy)
        s00 = r00 * r00 * sx2 + r01 * r01 * sy2 + r02 * r02 * sz2
        s01 = r00 * r10 * sx2 + r01 * r11 * sy2 + r02 * r12 * sz2
        s02 = r00 * r20 * sx2 + r01 * r21 * sy2 + r02 * r22 * sz2
        s11 = r10 * r10 * sx2 + r11 * r11 * sy2 + r12 * r12 * sz2
        s12 = r10 * r20 * sx2 + r11 * r21 * sy2 + r12 * r22 * sz2
        s22 = r20 * r20 * sx2 + r21 * r21 * sy2 + r22 * r22 * sz2
        return s00, s01, s02, s11, s12, s22

    f_cov6 = jax.jit(lambda: cov6(scales, qn))
    print("cov3d closed-form", timed(f_cov6), "ms", flush=True)

    # fwd+bwd of full projection (sum of outputs as loss)
    def loss(m, scales, qn, op, c):
        pg = project_gaussians(m, scales, qn, op, c, cam, W, H, 3)
        return (jnp.sum(pg.mean2d) + jnp.sum(pg.conic) + jnp.sum(pg.rgb)
                + jnp.sum(pg.radius) + jnp.sum(pg.opacity))
    f_g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    print("project fwd+bwd  ", timed(lambda: f_g(m, scales, qn, op, c)),
          "ms", flush=True)


if __name__ == "__main__":
    main()
