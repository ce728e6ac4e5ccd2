"""Host->device prefetchers: the background-thread transfer path must be
value-identical to the plain host pipeline (uint8 batches become
exactly astype(float32)/255. on device) and survive epoch resets and
loader errors without hanging the consumer."""
import numpy as np
import pytest

import jax

from mrefsr_tpu.data import BackgroundDevicePrefetcher, CPUPrefetcher


class ListLoader:
    """Minimal loader: a fixed list of collated batches per epoch."""

    def __init__(self, batches):
        self.batches = batches
        self.epochs_started = 0

    def __iter__(self):
        self.epochs_started += 1
        return iter(self.batches)


def make_batches(n=3, b=2, u8=True):
    rng = np.random.RandomState(0)
    out = []
    for i in range(n):
        img = rng.randint(0, 256, (b, 8, 8, 3)).astype(np.uint8)
        out.append({
            'img_in': img if u8 else img.astype(np.float32) / 255.,
            'img_skip': rng.randint(0, 256, (b, 4, 4, 3)).astype(
                np.uint8),
            'meta': [f'name{i}'] * b,
        })
    return out


def test_background_prefetcher_uint8_exact():
    batches = make_batches(u8=True)
    pf = BackgroundDevicePrefetcher(ListLoader(batches),
                                    device_keys=('img_in',), depth=2)
    for i in range(3):
        got = pf.next()
        assert isinstance(got['img_in'], jax.Array)
        assert got['img_in'].dtype == np.float32
        expect = batches[i]['img_in'].astype(np.float32) / 255.
        np.testing.assert_array_equal(np.asarray(got['img_in']), expect)
        # filtered keys pass through untouched (host-side)
        assert isinstance(got['img_skip'], np.ndarray)
        assert got['img_skip'].dtype == np.uint8
        assert got['meta'] == batches[i]['meta']
    assert pf.next() is None


def test_background_prefetcher_float_passthrough_values():
    batches = make_batches(u8=False)
    pf = BackgroundDevicePrefetcher(ListLoader(batches), depth=2)
    got = pf.next()
    assert isinstance(got['img_in'], jax.Array)
    np.testing.assert_array_equal(np.asarray(got['img_in']),
                                  batches[0]['img_in'])


def test_background_prefetcher_reset_restarts_epoch():
    batches = make_batches(n=4)
    loader = ListLoader(batches)
    pf = BackgroundDevicePrefetcher(loader, device_keys=('img_in',),
                                    depth=2)
    first = np.asarray(pf.next()['img_in'])
    pf.reset()  # mid-epoch reset: fresh iteration from batch 0
    again = np.asarray(pf.next()['img_in'])
    np.testing.assert_array_equal(first, again)
    assert loader.epochs_started >= 2


def test_background_prefetcher_propagates_loader_error():
    class BadLoader:
        def __iter__(self):
            yield make_batches(n=1)[0]
            raise RuntimeError('decode failed')

    pf = BackgroundDevicePrefetcher(BadLoader(), depth=2)
    pf.next()
    with pytest.raises(RuntimeError, match='decode failed'):
        pf.next()


def test_background_matches_cpu_prefetcher_order():
    batches = make_batches(n=5)
    cpu = CPUPrefetcher(ListLoader(batches))
    bg = BackgroundDevicePrefetcher(ListLoader(batches),
                                    device_keys=('img_in',), depth=3)
    while True:
        a = cpu.next()
        b = bg.next()
        assert (a is None) == (b is None)
        if a is None:
            break
        np.testing.assert_array_equal(
            a['img_in'].astype(np.float32) / 255.,
            np.asarray(b['img_in']))
