"""Image-denoising MRF (reference image/robot-map experiment parity):
latent pixels + noisy observations + robust truncated edge smoothness.

    python examples/run_image_denoise.py --engine hmc --cpu
"""

import numpy as np

from common import make_parser, run_engine, setup_platform
from lhvi_tpu.config import EngineConfig, from_args


def main():
    parser = make_parser(EngineConfig(collect="moments"), __doc__)
    parser.add_argument("--rows", type=int, default=16)
    parser.add_argument("--cols", type=int, default=16)
    parser.add_argument("--noise", type=float, default=0.3)
    args = parser.parse_args()
    cfg = from_args(EngineConfig, args)
    jax = setup_platform(args.cpu)

    from lhvi_tpu import compile_graph
    from lhvi_tpu.models.image import denoise_grid

    g, rvs, truth, obs = denoise_grid(args.rows, args.cols, noise=args.noise,
                                      seed=cfg.seed)
    fg = compile_graph(g)
    res = run_engine(fg, cfg, jax.random.PRNGKey(cfg.seed))
    est = np.array(
        [[res.mean(rvs[r][c]) for c in range(args.cols)]
         for r in range(args.rows)]
    )
    mse_est = float(np.mean((est - truth) ** 2))
    mse_obs = float(np.mean((obs - truth) ** 2))
    print(
        f"engine={cfg.engine}  wall={res.wall_s:.2f}s  "
        f"MSE: observed={mse_obs:.4f} -> denoised={mse_est:.4f} "
        f"({mse_obs / max(mse_est, 1e-9):.1f}x)"
    )


if __name__ == "__main__":
    main()
