"""Positional-encoding tests against the reference torch constructions."""

import math

import numpy as np
import torch

from cmr_agent_tpu.ops import sinusoid_table_1d, position_encoding_sine_2d


def _torch_sinusoid_1d(n_position, d_hid):
    """Reference models/ImageViT.py:31-38."""
    def angle_vec(pos):
        return [pos / np.power(10000, 2 * (j // 2) / d_hid) for j in range(d_hid)]
    table = np.array([angle_vec(p) for p in range(n_position)])
    table[:, 0::2] = np.sin(table[:, 0::2])
    table[:, 1::2] = np.cos(table[:, 1::2])
    return table.astype(np.float32)


def _torch_pe_2d(d_model, h, w):
    """Reference utils/positional_embedding_2d.py:22-31."""
    pe = torch.zeros((d_model, h, w))
    y_position = torch.ones((h, w)).cumsum(0).float().unsqueeze(0)
    x_position = torch.ones((h, w)).cumsum(1).float().unsqueeze(0)
    div_term = torch.exp(torch.arange(0, d_model // 2, 2).float()
                         * (-math.log(10000.0) / (d_model // 2)))
    div_term = div_term[:, None, None]
    pe[0::4, :, :] = torch.sin(x_position * div_term)
    pe[1::4, :, :] = torch.cos(x_position * div_term)
    pe[2::4, :, :] = torch.sin(y_position * div_term)
    pe[3::4, :, :] = torch.cos(y_position * div_term)
    return pe.numpy()


def test_sinusoid_1d_matches_reference():
    got = sinusoid_table_1d(80, 64)
    want = _torch_sinusoid_1d(80, 64)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pe_2d_matches_reference():
    got = position_encoding_sine_2d(64, 40, 128)  # [H, W, C]
    want = np.transpose(_torch_pe_2d(64, 40, 128), (1, 2, 0))
    np.testing.assert_allclose(got, want, atol=1e-5)
