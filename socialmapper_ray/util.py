"""Small engine utilities."""

from __future__ import annotations


def clamp_concurrency(requested: int, num_cpus_per_actor: float = 0.5,
                      reserve_cpus: float = 1.0) -> int:
    """Clamp an actor-pool size so the pool cannot starve upstream
    task-based stages: pool_cpus <= cluster_cpus - reserve.

    An oversized pool on a small session does not fail — it stalls the
    whole pipeline to a crawl (measured: flagship at concurrency=6 on a
    4-cpu session runs ~7x slower than at 3). A pipeline typically runs
    up to TWO actor pools concurrently (e.g. PIP join + enrich), so each
    pool gets half of the non-reserved CPUs. Library stage wrappers
    call this so callers' concurrency hints are safe by construction.
    """
    try:
        import ray

        cpus = float(ray.cluster_resources().get("CPU", 0)) or None
    except Exception:
        cpus = None
    if not cpus:
        return max(1, requested)
    budget = max(0.5, (cpus - reserve_cpus) / 2.0)
    max_pool = max(1, int(budget / max(num_cpus_per_actor, 1e-6)))
    return max(1, min(requested, max_pool))
