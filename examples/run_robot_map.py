"""Robot-mapping HMLN experiment (reference robot-mapping dataset family,
SURVEY.md §1/§3.1: hybrid relational model + on-disk evidence under
``Data/``): classify hallway laser-scan segments into wall/door/other and
fill in unmeasured depths.

    python examples/run_robot_map.py --engine vi
    python examples/run_robot_map.py --engine hmc --n-chains 128
    python examples/run_robot_map.py --data my_scan.db
"""

import os

import numpy as np

from common import make_parser, run_engine, setup_platform
from lhvi_tpu.config import RobotMapConfig, from_args


def main():
    args = make_parser(RobotMapConfig(), __doc__).parse_args()
    cfg = from_args(RobotMapConfig, args)
    jax = setup_platform(args.cpu)

    from lhvi_tpu import compile_graph
    from lhvi_tpu.lift import compile_lifted
    from lhvi_tpu.models.relational import robot_map, robot_scan_evidence
    from lhvi_tpu.relational.data import load_evidence

    data = cfg.data or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data", "robot_map.db"
    )
    evidence = load_evidence(data)
    # ground-truth labels exist only for the bundled synthetic scan
    # (data/robot_map.db is robot_scan_evidence(seed=0) on disk); a
    # user-supplied --data file has no known labels to score against
    true_types = (
        robot_scan_evidence(cfg.n_segments, seed=0)[1]
        if not cfg.data
        else None
    )

    rg = robot_map(cfg.n_segments, evidence=evidence)
    g, index = rg.ground()
    n_lat = sum(1 for rv in g.rvs if not rv.observed)
    print(f"data={data}: {len(evidence)} evidence atoms; "
          f"{len(g.rvs)} ground RVs ({n_lat} latent), {len(g.factors)} factors")

    fg = compile_lifted(g) if cfg.lifted else compile_graph(g)
    res = run_engine(fg, cfg, jax.random.PRNGKey(cfg.seed))
    print(f"engine={cfg.engine}  wall={res.wall_s:.2f}s")

    correct = total = 0
    for i in range(cfg.n_segments):
        rv = index[("type", (f"s{i}",))]
        if rv.observed:
            continue
        probs = np.asarray(res.disc_marginal(rv))
        pred = int(probs.argmax())
        total += 1
        if true_types is not None:
            correct += pred == true_types[i]
        if i < 8:
            true = f" true={true_types[i]}" if true_types is not None else ""
            print(f"  type(s{i}): P={probs.round(3)}  pred={pred}{true}")
    if true_types is not None:
        print(f"type accuracy on {total} unlabeled segments: "
              f"{correct}/{total}")
    else:
        print(f"{total} unlabeled segments classified "
              "(no ground truth for user-supplied --data)")
    for i in range(cfg.n_segments):
        rv = index[("depth", (f"s{i}",))]
        if not rv.observed:
            true = (f" (true segment type {true_types[i]})"
                    if true_types is not None else "")
            print(f"  E[depth(s{i})] = {res.mean(rv):+.3f}{true}")


if __name__ == "__main__":
    main()
