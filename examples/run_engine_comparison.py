"""Engine comparison: marginal error vs compute across ALL backends.

Mirrors the reference's headline experiment (SURVEY.md §1/§7: the paper's
figures are OSI-vs-EPBP/LBP marginal-error-per-iteration curves on shared
models; no absolute numbers published, BASELINE.md). One script sweeps a
budget ladder per engine on one model, scores every latent's posterior
mean against an exact oracle, and emits the error-vs-wall curve as JSONL
(`--metrics out.jsonl`) plus a printed table — the JSONL replaces the
reference's matplotlib plots (accepted in VERDICT r1).

    python examples/run_engine_comparison.py --model chain
    python examples/run_engine_comparison.py --model grid --engines vi,lbp
"""

import argparse
import time

import numpy as np

from common import setup_platform  # noqa: F401 (sys.path side effect)

BUDGETS = {
    # engine -> budget ladder (engine-native units, logged per point)
    "vi": [10, 30, 100, 300, 1000],
    "lbp": [1, 2, 5, 10, 20],
    "epbp": [1, 2, 5, 10, 20],
    "gabp": [1, 2, 5, 10, 20, 50],
    "hmc": [50, 150, 500, 1500],
    "nuts": [50, 150, 500],
    "smc": [10, 20, 50, 100],
}
UNITS = {
    "vi": "adam_steps", "lbp": "bp_iters", "epbp": "bp_iters",
    "gabp": "bp_iters", "hmc": "samples", "nuts": "samples",
    "smc": "temperatures",
}


def build(model: str, seed: int):
    """Returns (graph, latents, oracle_means dict keyed by id(rv))."""
    from lhvi_tpu.engines import gabp
    from lhvi_tpu.models.toy import gaussian_grid, hybrid_chain
    from lhvi_tpu.utils.oracle import ExactPosterior

    if model == "chain":
        g, _ = hybrid_chain()
        latents = [rv for rv in g.rvs if not rv.observed]
        exact = ExactPosterior(g, cont_grid=201)
        means = {id(rv): exact.mean(rv) for rv in latents
                 if rv.domain.continuous}
        disc = {id(rv): exact.disc_marginal(rv) for rv in latents
                if not rv.domain.continuous}
        return g, latents, means, disc
    if model == "grid":
        g, _ = gaussian_grid(rows=6, cols=6, seed=seed, evidence_frac=0.2)
        oracle, latents = gabp.dense_gaussian_marginals(g)
        means = {id(rv): oracle[id(rv)][0] for rv in latents}
        return g, latents, means, {}
    if model == "smokers":
        from lhvi_tpu.models.relational import friends_smokers

        rg = friends_smokers(n_people=3, hybrid=True)
        rg.observe("smokes", ("p0",), 1)
        g, _ = rg.ground()
        latents = [rv for rv in g.rvs if not rv.observed]
        exact = ExactPosterior(g, cont_grid=81)
        means = {id(rv): exact.mean(rv) for rv in latents
                 if rv.domain.continuous}
        disc = {id(rv): exact.disc_marginal(rv) for rv in latents
                if not rv.domain.continuous}
        return g, latents, means, disc
    raise ValueError(f"unknown model {model!r} (chain|grid|smokers)")


def run_point(engine: str, budget: int, g, fg, key):
    """One (engine, budget) run; returns a result with .mean/.disc_marginal
    and the wall seconds (including device sync via the queries)."""
    from lhvi_tpu.engines import gabp, hmc, nuts, smc, vi
    from lhvi_tpu.engines.epbp import EPBP, EPBPConfig
    from lhvi_tpu.engines.lbp import HybridLBP

    t0 = time.perf_counter()
    if engine == "vi":
        res = vi.infer(fg, key, vi.VIConfig(K=4, n_iters=budget))
    elif engine == "lbp":
        res = HybridLBP(fg).run(budget)
    elif engine == "epbp":
        res = EPBP(fg, EPBPConfig(64, budget)).run(key)
    elif engine == "gabp":
        res = gabp.GaBP(g).run(budget)
    elif engine == "hmc":
        res = hmc.sample(fg, key, n_chains=64, n_warmup=budget // 2,
                         n_samples=budget, collect="moments")
    elif engine == "nuts":
        res = nuts.sample(fg, key, n_chains=64, n_warmup=budget // 2,
                          n_samples=budget, collect="moments")
    elif engine == "smc":
        res = smc.sample(fg, key,
                         smc.SMCConfig(n_particles=4096, n_temps=budget))
    else:
        raise ValueError(f"unknown engine {engine!r}")
    return res, time.perf_counter() - t0


def score(res, latents, means, disc):
    errs, derrs = [], []
    for rv in latents:
        if id(rv) in means:
            errs.append(abs(float(res.mean(rv)) - means[id(rv)]))
        elif id(rv) in disc:
            try:
                m = np.asarray(res.disc_marginal(rv))
                derrs.append(float(np.abs(m - disc[id(rv)]).max()))
            except (ValueError, NotImplementedError):
                pass  # engine has no discrete marginals (e.g. GaBP)
    return errs, derrs


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="chain",
                   choices=("chain", "grid", "smokers"))
    p.add_argument("--engines", default="vi,lbp,epbp,hmc,nuts,smc")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--metrics", default="")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--quick", action="store_true",
                   help="one small budget per engine (CI smoke)")
    args = p.parse_args()
    if args.quick:
        for k, lad in BUDGETS.items():
            BUDGETS[k] = lad[:1]
    jax = setup_platform(args.cpu)

    from lhvi_tpu import compile_graph
    from lhvi_tpu.utils.metrics import MetricsLogger

    g, latents, means, disc = build(args.model, args.seed)
    fg = compile_graph(g)
    log = MetricsLogger(args.metrics or None, echo=True)
    log.log("setup", model=args.model, n_latents=len(latents),
            engines=args.engines)

    engines = [e.strip() for e in args.engines.split(",") if e.strip()]
    if args.model != "grid":
        engines = [e for e in engines if e != "gabp"]
    rows = []
    for engine in engines:
        for budget in BUDGETS[engine]:
            key = jax.random.PRNGKey(args.seed)
            try:
                res, wall = run_point(engine, budget, g, fg, key)
                errs, derrs = score(res, latents, means, disc)
            except Exception as e:  # noqa: BLE001 — sweep survives one engine
                log.log("error", engine=engine, budget=budget,
                        what=repr(e)[:200])
                continue
            rec = log.log(
                "point", engine=engine, budget=budget,
                budget_unit=UNITS[engine], wall_s=round(wall, 3),
                mean_err_avg=(round(float(np.mean(errs)), 5)
                              if errs else None),
                mean_err_max=(round(float(np.max(errs)), 5)
                              if errs else None),
                disc_err_max=(round(float(np.max(derrs)), 5)
                              if derrs else None),
            )
            rows.append(rec)
    log.close()

    print(f"\n{'engine':>6} {'budget':>7} {'wall_s':>8} "
          f"{'mean_err':>9} {'disc_err':>9}")
    for r in rows:
        print(f"{r['engine']:>6} {r['budget']:>7} {r['wall_s']:>8.3f} "
              f"{(r['mean_err_avg'] if r['mean_err_avg'] is not None else float('nan')):>9.5f} "
              f"{(r['disc_err_max'] if r['disc_err_max'] is not None else float('nan')):>9.5f}")


if __name__ == "__main__":
    main()
