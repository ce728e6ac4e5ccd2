"""Download a single file from google drive by id
(reference scripts/download_gdrive.py)."""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
from mrefsr_tpu.utils.download_util import \
    download_file_from_google_drive  # noqa: E402

if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--id', type=str, help='File id')
    parser.add_argument('--output', type=str, help='Save path')
    args = parser.parse_args()
    download_file_from_google_drive(args.id, args.output)
