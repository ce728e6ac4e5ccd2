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


def test_background_prefetcher_exhausted_returns_none_repeatedly():
    """After the epoch-end sentinel, next() keeps returning None like
    CPU/DevicePrefetcher (regression: a single-sentinel queue made the
    train loop's post-wave next() block forever at any epoch whose
    length is not a multiple of steps_per_dispatch); reset() revives
    the prefetcher for the next epoch."""
    import threading

    batches = make_batches(n=3)
    pf = BackgroundDevicePrefetcher(ListLoader(batches),
                                    device_keys=('img_in',), depth=2)
    for _ in range(3):
        assert pf.next() is not None

    results = []

    def drain():
        # wave-loop shape: the tail-batch collection consumes the
        # sentinel, then the loop bottom calls next() once more
        results.append(pf.next())
        results.append(pf.next())
        results.append(pf.next())

    th = threading.Thread(target=drain, daemon=True)
    th.start()
    th.join(timeout=30)
    assert not th.is_alive(), 'next() blocked after exhaustion'
    assert results == [None, None, None]

    pf.reset()
    assert pf.next() is not None


def test_as_f32_scales_host_uint8():
    """BaseModel._as_f32 applies the uint8 pipeline's astype(f32)/255.
    to HOST uint8 arrays, so output_dtype: uint8 stays correct under
    any prefetcher (regression: the CPU prefetcher handed feed_data raw
    uint8 and the model trained on [0, 255] inputs)."""
    from mrefsr_tpu.models.base_model import BaseModel

    u8 = np.arange(0, 256, dtype=np.uint8).reshape(1, 8, 8, 4)
    out = BaseModel._as_f32(u8)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, u8.astype(np.float32) / 255.)

    f32 = np.linspace(0, 1, 48, dtype=np.float32).reshape(1, 4, 4, 3)
    np.testing.assert_array_equal(BaseModel._as_f32(f32), f32)

    dev = jax.device_put(f32)
    assert BaseModel._as_f32(dev) is dev
