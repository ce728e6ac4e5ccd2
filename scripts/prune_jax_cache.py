"""Prune the committed XLA compile cache (`.jax_cache/`) to the live set.

The cache exists so the driver's `bench.py` run warm-starts the
minutes-long stage3 scan compile (bench.py points
JAX_COMPILATION_CACHE_DIR here). Entries keyed by stale shapes survive
every shape change and compound the git pack, so once per round:

  python scripts/prune_jax_cache.py -- python bench.py
  python scripts/prune_jax_cache.py --dir .jax_cache_cpu -- \
      python -c "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"

moves the cache dir aside, runs the command against an empty cache, and
keeps exactly the entries the run (re)creates — the authoritative live
set. Entries that exist in the old cache under the same key are COPIED
back rather than kept from the fresh run, so byte-identical executables
don't churn in git. The old cache is left in `.jax_cache.prev/` for a
manual diff; delete it before committing.

Exit code mirrors the wrapped command.
"""
import argparse
import os
import os.path as osp
import shutil
import subprocess
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--dir', default='.jax_cache',
                    help='cache dir relative to the repo root '
                         '(.jax_cache for TPU/bench, .jax_cache_cpu '
                         'for the multichip dryrun)')
    ap.add_argument('cmd', nargs=argparse.REMAINDER,
                    help='command to run (prefix with --)')
    args = ap.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == '--':
        cmd = cmd[1:]
    if not cmd:
        ap.error('no command given (usage: ... -- python bench.py)')
    CACHE = osp.join(REPO, args.dir)
    PREV = CACHE + '.prev'

    if osp.isdir(PREV):
        shutil.rmtree(PREV)
    had_cache = osp.isdir(CACHE)
    if had_cache:
        os.rename(CACHE, PREV)
    else:
        os.makedirs(PREV)  # empty stand-in: no entries to reuse
    os.makedirs(CACHE, exist_ok=True)

    proc = subprocess.run(cmd, cwd=REPO)
    if proc.returncode != 0:
        # failed run = unknown live set; restore the old cache
        shutil.rmtree(CACHE)
        if had_cache:
            os.rename(PREV, CACHE)
        else:
            shutil.rmtree(PREV)
        print(f'command failed ({proc.returncode}); cache restored',
              file=sys.stderr)
        sys.exit(proc.returncode)

    kept = reused = 0
    for name in os.listdir(CACHE):
        old = osp.join(PREV, name)
        if osp.isfile(old):
            shutil.copy2(old, osp.join(CACHE, name))  # avoid git churn
            reused += 1
        else:
            kept += 1
    dropped = sum(1 for n in os.listdir(PREV)
                  if not osp.exists(osp.join(CACHE, n)))
    size = sum(os.path.getsize(osp.join(CACHE, n))
               for n in os.listdir(CACHE)) / 1e6
    print(f'pruned .jax_cache: {reused} reused, {kept} new, '
          f'{dropped} dropped; now {size:.1f} MB '
          f'(old cache in {PREV} — delete before committing)')


if __name__ == '__main__':
    main()
