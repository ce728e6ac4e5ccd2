"""The standard dataset inventories ship with the package
(reference basicsr/data/meta_info/ — 10 txt files for REDS / Vimeo90K /
DIV2K; these are data inventories, copied verbatim)."""
import os.path as osp

META_DIR = osp.join(osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))), 'mrefsr_tpu', 'data', 'meta_info')

EXPECTED = [
    'meta_info_DIV2K800sub_GT.txt',
    'meta_info_REDS4_test_GT.txt',
    'meta_info_REDS_GT.txt',
    'meta_info_REDSofficial4_test_GT.txt',
    'meta_info_REDSval_official_test_GT.txt',
    'meta_info_Vimeo90K_test_GT.txt',
    'meta_info_Vimeo90K_test_fast_GT.txt',
    'meta_info_Vimeo90K_test_medium_GT.txt',
    'meta_info_Vimeo90K_test_slow_GT.txt',
    'meta_info_Vimeo90K_train_GT.txt',
]


def test_meta_info_files_ship():
    for name in EXPECTED:
        path = osp.join(META_DIR, name)
        assert osp.isfile(path), f'missing {name}'
        with open(path) as f:
            first = f.readline().split()
        assert first, f'{name} is empty'


def test_reds_meta_info_format():
    """REDS meta lines are '<clip> <n_frames> (<h>,<w>,<c>)' — the
    format reds_dataset.py:38 parses."""
    with open(osp.join(META_DIR, 'meta_info_REDS_GT.txt')) as f:
        for line in f:
            clip, n, shape = line.split()
            assert int(n) == 100
            assert shape == '(720,1280,3)'
