"""Model/file download helpers
(reference basicsr/utils/download_util.py:11-99). Requires network
access + the ``requests`` package (gated)."""
import math
import os
from urllib.parse import urlparse

from .misc import sizeof_fmt


def download_file_from_google_drive(file_id, save_path):
    """Google-drive download with confirm-token handling
    (reference download_util.py:11-45)."""
    import requests
    session = requests.Session()
    url = 'https://docs.google.com/uc?export=download'
    params = {'id': file_id}

    response = session.get(url, params=params, stream=True)
    token = get_confirm_token(response)
    if token:
        params['confirm'] = token
        response = session.get(url, params=params, stream=True)

    # get file size
    response_file_size = session.get(url, params=params, stream=True,
                                     headers={'Range': 'bytes=0-2'})
    if 'Content-Range' in response_file_size.headers:
        file_size = int(
            response_file_size.headers['Content-Range'].split('/')[1])
    else:
        file_size = None
    save_response_content(response, save_path, file_size)


def get_confirm_token(response):
    for key, value in response.cookies.items():
        if key.startswith('download_warning'):
            return value
    return None


def save_response_content(response, destination, file_size=None,
                          chunk_size=32768):
    downloaded_size = 0
    with open(destination, 'wb') as f:
        for chunk in response.iter_content(chunk_size):
            if not chunk:  # keep-alive chunks
                continue
            # count actual bytes (the reference adds chunk_size even for
            # short/final chunks, download_util.py:60 — progress >100%)
            downloaded_size += len(chunk)
            if file_size is not None:
                ratio = math.ceil(downloaded_size / file_size * 100)
                print(f'\rDownload {ratio}% -- '
                      f'{sizeof_fmt(downloaded_size)} / '
                      f'{sizeof_fmt(file_size)}', end='')
            f.write(chunk)
        print()


def load_file_from_url(url, model_dir=None, progress=True,
                       file_name=None):
    """Download a url file into model_dir
    (reference download_util.py:70-99)."""
    import requests
    if model_dir is None:
        model_dir = os.path.join(os.path.expanduser('~'), '.cache',
                                 'mrefsr_tpu', 'weights')
    os.makedirs(model_dir, exist_ok=True)

    parts = urlparse(url)
    filename = os.path.basename(parts.path)
    if file_name is not None:
        filename = file_name
    cached_file = os.path.abspath(os.path.join(model_dir, filename))
    if not os.path.exists(cached_file):
        print(f'Downloading: "{url}" to {cached_file}\n')
        with requests.get(url, stream=True) as r:
            r.raise_for_status()
            save_response_content(
                r, cached_file,
                int(r.headers.get('Content-Length', 0)) or None)
    return cached_file
