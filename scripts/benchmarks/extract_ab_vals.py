"""Extract A/B validation trajectories from experiment train logs.

Parses every ``# Validation <set> # PSNR: ... # PSNR_Y: ... #
SSIM_Y: ...`` line out of ``experiments/<name>/train_*.log`` (all log
files of the experiment, in filename/timestamp order — auto-resumed
runs append a new log) and prints a JSON list of
``{psnr, psnr_y, ssim_y}`` dicts, the format ``docs/ab_results.json``
stores per arm. Consecutive duplicate entries (end-of-training re-logs
the final val) are dropped, matching the round-4 convention.

Usage:
  python scripts/benchmarks/extract_ab_vals.py ab_dcn_25k [ab_flow_25k ...]
Prints {name: [...], ...} for the named experiments.
"""
import json
import os.path as osp
import re
import sys
from glob import glob

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
PAT = re.compile(
    r'# Validation \S+ # PSNR: ([\d.e+-]+) # PSNR_Y: ([\d.e+-]+) '
    r'# SSIM_Y: ([\d.e+-]+?)\.?\s*$')


def extract(name):
    logs = sorted(glob(osp.join(REPO, 'experiments', name,
                                'train_*.log')))
    if not logs:
        raise FileNotFoundError(f'no train logs for experiment {name}')
    vals = []
    for path in logs:
        with open(path) as f:
            for line in f:
                m = PAT.search(line)
                if m:
                    entry = {'psnr': round(float(m.group(1)), 3),
                             'psnr_y': round(float(m.group(2)), 3),
                             'ssim_y': round(float(m.group(3)), 5)}
                    if not vals or vals[-1] != entry:
                        vals.append(entry)
    return vals


if __name__ == '__main__':
    print(json.dumps({n: extract(n) for n in sys.argv[1:]}, indent=1))
