"""check_resume rewrites pretrain paths to the resumed .pth files
(regression: the extension was once dropped, breaking --auto_resume)."""
from mrefsr_tpu.utils.misc import check_resume


def test_check_resume_rewrites_paths():
    opt = {
        'network_g': {'type': 'MSRResNet'},
        'network_d': {'type': 'UNetDiscriminatorSN'},
        'path': {
            'resume_state': 'experiments/x/training_states/8.state',
            'models': 'experiments/x/models',
            'pretrain_network_g': None,
            'param_key_g': 'params_ema',
        },
    }
    check_resume(opt, 8)
    assert opt['path']['pretrain_network_g'] == \
        'experiments/x/models/net_g_8.pth'
    assert opt['path']['pretrain_network_d'] == \
        'experiments/x/models/net_d_8.pth'
    # EMA param key falls back to params on resume (reference
    # misc.py:118-126)
    assert opt['path']['param_key_g'] == 'params'


def test_check_resume_respects_ignore_list():
    opt = {
        'network_g': {'type': 'MSRResNet'},
        'network_map': {'type': 'CorrespondenceGenerationArch'},
        'path': {
            'resume_state': 's',
            'models': 'm',
            'ignore_resume_networks': ['network_map'],
        },
    }
    check_resume(opt, 4)
    assert opt['path']['pretrain_network_g'] == 'm/net_g_4.pth'
    assert 'pretrain_network_map' not in opt['path'] or \
        opt['path'].get('pretrain_network_map') is None
