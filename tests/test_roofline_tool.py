"""tools/roofline.py FLOP model: conv/dot FLOPs parsed from compiled-HLO
text must match hand counts — including the dgrad/wgrad window forms whose
naive window-product estimate is ~100x off (huge pads multiply zeros)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

pytestmark = pytest.mark.fast

_HLO = """\
HloModule jit_step, is_scheduled=true

%fused_computation.1 (param_0.1: bf16[8,256,256,128], param_1.1: bf16[5,5,128,64]) -> bf16[8,256,256,64] {
  %param_0.1 = bf16[8,256,256,128]{3,0,2,1} parameter(0)
  %param_1.1 = bf16[5,5,128,64]{3,2,1,0} parameter(1)
  ROOT %conv.inner = bf16[8,256,256,64]{3,0,2,1} convolution(%param_0.1, %param_1.1), window={size=5x5 pad=2_2x2_2}, dim_labels=b01f_01io->b01f
}

ENTRY %main {
  %p0 = bf16[8,256,256,128]{3,0,2,1} parameter(0)
  %w0 = bf16[5,5,128,64]{3,2,1,0} parameter(1)
  %conv.fwd = bf16[8,256,256,64]{3,0,2,1} convolution(%p0, %w0), window={size=5x5 pad=2_2x2_2}, dim_labels=b01f_01io->b01f
  %dz = bf16[8,128,128,128]{3,0,2,1} parameter(2)
  %act = bf16[8,256,256,64]{3,0,2,1} parameter(3)
  %conv.wgrad = bf16[8,8,64,128]{3,2,1,0} convolution(%act, %dz), window={size=128x128 pad=3_3x3_3 rhs_dilate=2x2}, dim_labels=f01b_i01o->01bf
  %a = bf16[393216,192]{1,0} parameter(4)
  %b = bf16[192,256]{1,0} parameter(5)
  %mm = f32[393216,256]{1,0} dot(%a, %b), lhs_contracting_dims={1}, rhs_contracting_dims={0}
  %fusion.9 = bf16[8,256,256,64]{3,0,2,1} fusion(%p0, %w0), kind=kOutput, calls=%fused_computation.1
}
"""


@pytest.fixture
def idx(tmp_path):
    from roofline import HloIndex

    p = tmp_path / "hlo.txt"
    p.write_text(_HLO)
    return HloIndex(str(p))


def test_forward_conv_flops(idx):
    # 2 * B*OH*OW*O * KH*KW*I = 2 * 8*256*256*64 * 5*5*128
    want = 2 * 8 * 256 * 256 * 64 * 5 * 5 * 128
    got = idx.op_flops("%conv.fwd")
    assert abs(got - want) / want < 0.05   # boundary taps shave <5%


def test_wgrad_conv_flops_not_window_product(idx):
    # true wgrad work: every filter-grad element [kh,kw,ci,co] reduces over
    # B*OH*OW = window 128x128 taps x rhs 'i' dim (the relabeled batch, 8);
    # out = [8,8,64,128] (01bf: spatial=KH,KW, b=CI, f=CO)
    want = 2 * (8 * 8 * 64 * 128) * (128 * 128 * 8)
    got = idx.op_flops("%conv.wgrad")
    assert abs(got - want) / want < 0.05   # rhs_dilate boundary taps
    # and nowhere near the naive all-window-taps blowup for padded windows
    assert got < 2 * want


def test_dot_flops(idx):
    want = 2 * 393216 * 192 * 256 * 4     # f32 output -> 4x bf16-equivalent
    assert idx.op_flops("%mm") == want


def test_fusion_body_conv_counted_via_calls(idx):
    # the fusion's ROOT conv must be found through calls=..., ROOT prefix
    # included (a plain `%name =` regex misses ROOT lines)
    assert idx.op_flops("%fusion.9") == idx.op_flops("%conv.fwd")


def test_conv_taps_huge_pad_counts_only_valid():
    from roofline import _conv_taps

    # dgrad-like: window 256 with pad 255_255 over a 4-wide input — at most
    # 4 taps can ever be valid regardless of the window size
    taps = _conv_taps("size=256 pad=255_255", [4], [256])
    assert taps <= 4.0
