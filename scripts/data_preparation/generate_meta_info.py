"""Meta-info file generation
(reference scripts/data_preparation/generate_meta_info.py)."""
import os.path as osp
import sys

from PIL import Image

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))
from mrefsr_tpu.utils.misc import scandir  # noqa: E402


def generate_meta_info_div2k(gt_folder='datasets/DIV2K/DIV2K_train_HR_sub',
                             meta_info_txt='mrefsr_tpu/data/meta_info/'
                                           'meta_info_DIV2K800sub_GT.txt'):
    """One line per image: ``name (h,w,c)``."""
    img_list = sorted(scandir(gt_folder))
    with open(meta_info_txt, 'w') as f:
        for idx, img_path in enumerate(img_list):
            img = Image.open(osp.join(gt_folder, img_path))
            width, height = img.size
            mode = img.mode
            if mode == 'RGB':
                n_channel = 3
            elif mode == 'L':
                n_channel = 1
            else:
                raise ValueError(f'Unsupported mode {mode}.')
            info = f'{img_path} ({height},{width},{n_channel})'
            print(idx + 1, info)
            f.write(f'{info}\n')


if __name__ == '__main__':
    generate_meta_info_div2k()
