"""Guard: the git-TRACKED XLA compile cache stays within budget.

`.jax_cache/` is committed so the driver's `bench.py` warm-starts the
minutes-long stage3 compile (bench.py module docstring), and
`.jax_cache_cpu/` warm-starts the CPU multichip dryrun. The policy is
"live bench set only" (scripts/prune_jax_cache.py): entries keyed by
stale code/shapes are dead weight that permanently bloats the git
pack. Rounds 3 and 4 both let the tracked set regrow silently after
bench additions — this test makes that a visible failure instead.

On breach: re-prune with
  python scripts/prune_jax_cache.py -- python bench.py
  python scripts/prune_jax_cache.py --dir .jax_cache_cpu -- \
      python -c "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
then `git add` the pruned dirs. Raise the budget only if the live
default-bench set itself grew (check the entry list first).
"""
import os.path as osp
import subprocess

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
BUDGET_MB = 150.0


def test_tracked_compile_cache_within_budget():
    out = subprocess.run(
        ['git', 'ls-files', '-z', '--', '.jax_cache', '.jax_cache_cpu'],
        cwd=REPO, capture_output=True, check=True)
    total = 0
    n = 0
    for rel in out.stdout.decode().split('\0'):
        if not rel:
            continue
        path = osp.join(REPO, rel)
        if osp.exists(path):  # deleted-but-staged entries don't count
            total += osp.getsize(path)
            n += 1
    total_mb = total / 1e6
    assert total_mb <= BUDGET_MB, (
        f'tracked compile cache is {total_mb:.1f} MB across {n} files '
        f'(budget {BUDGET_MB:.0f} MB) — re-prune to the live bench set '
        f'(see this test\'s docstring)')
