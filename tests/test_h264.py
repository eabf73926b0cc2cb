"""From-scratch H.264 I_PCM codec (functions/h264.py) — spec-pinned.

Pins the public Rec. H.264 structures the codec relies on: Exp-Golomb
Table 9-2 codewords, emulation prevention (7.4.1.1), SPS golden bytes
assembled bit-by-bit in the test, cropping arithmetic (7.4.2.1.1), and
bit-exact I_PCM sample carriage. No ffmpeg in this sandbox — conformance
is evidenced by hand-built bitstreams on the decode side and by byte
literal pins on the encode side.
"""

import numpy as np
import pytest

from benthos_spark.functions import h264
from benthos_spark.functions.h264 import (
    H264Error,
    _BitReader,
    _BitWriter,
    _ebsp_escape,
    _ebsp_unescape,
    _split_annexb,
)


# ------------------------------------------------------------ Exp-Golomb


def test_ue_codewords_table_9_2():
    # Rec. H.264 Table 9-2: codeNum -> bit string
    expected = {
        0: "1",
        1: "010",
        2: "011",
        3: "00100",
        4: "00101",
        5: "00110",
        6: "00111",
        7: "0001000",
        8: "0001001",
    }
    for v, bits in expected.items():
        w = _BitWriter()
        w.ue(v)
        w.align_zero()
        got = "".join(f"{b:08b}" for b in w.getvalue())[: len(bits)]
        assert got == bits, f"ue({v})"


def test_se_mapping_table_9_3():
    # Table 9-3: codeNum 0,1,2,3,4 -> 0,1,-1,2,-2
    for val in [0, 1, -1, 2, -2, 7, -7, 100, -100]:
        w = _BitWriter()
        w.se(val)
        w.align_zero()
        r = _BitReader(w.getvalue())
        assert r.se() == val


def test_ue_roundtrip_wide_range():
    w = _BitWriter()
    vals = list(range(0, 300)) + [2**16, 2**20 - 1]
    for v in vals:
        w.ue(v)
    w.align_zero()
    r = _BitReader(w.getvalue())
    for v in vals:
        assert r.ue() == v


# ---------------------------------------------------- emulation prevention


@pytest.mark.parametrize(
    "rbsp,ebsp",
    [
        (b"\x00\x00\x00", b"\x00\x00\x03\x00"),
        (b"\x00\x00\x01", b"\x00\x00\x03\x01"),
        (b"\x00\x00\x02", b"\x00\x00\x03\x02"),
        (b"\x00\x00\x03", b"\x00\x00\x03\x03"),
        (b"\x00\x00\x04", b"\x00\x00\x04"),
        (b"\x00\x00\x00\x00\x00", b"\x00\x00\x03\x00\x00\x03\x00"),
        (b"\x01\x00\x00\x01\x00\x00", b"\x01\x00\x00\x03\x01\x00\x00"),
    ],
)
def test_emulation_prevention_vectors(rbsp, ebsp):
    assert _ebsp_escape(rbsp) == ebsp
    assert _ebsp_unescape(ebsp) == rbsp


def test_emulation_prevention_roundtrip_random():
    rng = np.random.RandomState(7)
    for _ in range(50):
        # bias toward zeros to exercise the escape logic hard
        raw = bytes(rng.choice([0, 0, 0, 1, 2, 3, 255], size=200).astype(np.uint8))
        assert _ebsp_unescape(_ebsp_escape(raw)) == raw


def test_no_start_code_emulation_in_stream():
    # PCM payload engineered to contain 00 00 01 repeatedly: the NAL
    # layer must make in-payload start codes impossible.
    fr = np.zeros((16, 16), dtype=np.uint8)
    fr[0, 2] = 1  # luma row: 00 00 01 ...
    blob = h264.encode([fr], fps=10.0)
    # only the four real start codes (SPS, PPS, slice) exist
    count = 0
    i = 0
    while i + 3 < len(blob):
        if blob[i : i + 4] == b"\x00\x00\x00\x01":
            count += 1
            i += 4
        else:
            i += 1
    assert count == 3
    out, _ = h264.decode(blob)
    assert np.array_equal(out[0], fr)


# ------------------------------------------------------------ SPS golden


def test_sps_golden_bytes():
    # Assemble the expected SPS for 2x1 MBs, no crop, fps=25 bit-by-bit
    # from the clause 7.3.2.1.1 field list and compare byte-for-byte.
    bits = ""
    bits += f"{66:08b}"  # profile_idc
    bits += "11000000"  # constraint_set0/1 + reserved
    bits += f"{30:08b}"  # level_idc
    bits += "1"  # sps_id ue(0)
    bits += "1"  # log2_max_frame_num_minus4 ue(0)
    bits += "011"  # pic_order_cnt_type ue(2)
    bits += "1"  # max_num_ref_frames ue(0)
    bits += "0"  # gaps_in_frame_num_value_allowed_flag
    bits += "010"  # pic_width_in_mbs_minus1 ue(1)
    bits += "1"  # pic_height_in_map_units_minus1 ue(0)
    bits += "1"  # frame_mbs_only_flag
    bits += "1"  # direct_8x8_inference_flag
    bits += "0"  # frame_cropping_flag
    bits += "1"  # vui_parameters_present_flag
    bits += "0" + "0"  # aspect_ratio, overscan
    bits += "1" + "101" + "1" + "0"  # signal type: format=5, full_range, no colour desc
    bits += "0"  # chroma_loc
    bits += "1"  # timing_info_present_flag
    bits += f"{1000:032b}" + f"{50000:032b}" + "1"  # tick, scale, fixed
    bits += "0" + "0" + "0" + "0"  # hrd x2, pic_struct, bitstream_restriction
    bits += "1"  # rbsp_stop_one_bit
    bits += "0" * ((8 - len(bits) % 8) % 8)
    expected = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    assert h264._sps_rbsp(2, 1, 0, 0, 25.0) == expected


def test_sps_parse_back():
    sps = h264._parse_sps(h264._sps_rbsp(5, 3, 8, 10, 12.5))
    assert sps["mb_w"] == 5 and sps["mb_h"] == 3
    assert sps["width"] == 5 * 16 - 8 and sps["height"] == 3 * 16 - 10
    assert sps["fps"] == pytest.approx(12.5)


# ------------------------------------------------------------ round trips


def test_gray_roundtrip_bit_exact():
    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 256, size=(24, 32)).astype(np.uint8) for _ in range(5)]
    blob = h264.encode(frames, fps=8.0)
    out, fps = h264.decode(blob)
    assert fps == pytest.approx(8.0)
    assert len(out) == 5
    for a, b in zip(frames, out):
        assert b.ndim == 2
        assert np.array_equal(a, b)


def test_cropped_dims_roundtrip():
    # 30x22 -> 2x2 MBs with right crop 2 and bottom crop 10
    rng = np.random.RandomState(11)
    fr = rng.randint(0, 256, size=(22, 30)).astype(np.uint8)
    out, _ = h264.decode(h264.encode([fr]))
    assert out[0].shape == (22, 30)
    assert np.array_equal(out[0], fr)


def test_ycbcr_roundtrip_bit_exact():
    rng = np.random.RandomState(5)
    y = rng.randint(0, 256, size=(32, 48)).astype(np.uint8)
    cb = rng.randint(0, 256, size=(16, 24)).astype(np.uint8)
    cr = rng.randint(0, 256, size=(16, 24)).astype(np.uint8)
    blob = h264.encode_ycbcr([(y, cb, cr)], fps=30.0)
    planes, fps = h264.decode_ycbcr(blob)
    assert fps == pytest.approx(30.0)
    yd, cbd, crd = planes[0]
    assert np.array_equal(y, yd)
    assert np.array_equal(cb, cbd)
    assert np.array_equal(cr, crd)


def test_rgb_roundtrip_luma_exact_chroma_close():
    rng = np.random.RandomState(9)
    fr = rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
    blob = h264.encode([fr])
    out, _ = h264.decode(blob)
    assert out[0].shape == fr.shape
    # the carried Y plane IS the source luma (bit-exact through I_PCM)
    lum = 0.299 * fr[..., 0] + 0.587 * fr[..., 1] + 0.114 * fr[..., 2]
    planes, _fps = h264.decode_ycbcr(blob)
    y = planes[0][0]
    assert np.array_equal(y, np.clip(np.floor(lum + 0.5), 0, 255).astype(np.uint8))
    # smooth content round-trips closely (4:2:0 chroma loss only)
    smooth = np.zeros((16, 16, 3), np.uint8)
    smooth[:, :, 0] = 200
    smooth[:, :, 1] = 100
    smooth[:, :, 2] = 50
    out2, _ = h264.decode(h264.encode([smooth]))
    assert np.abs(out2[0].astype(int) - smooth.astype(int)).max() <= 2


def test_multi_frame_idr_pic_id_alternates():
    frames = [np.full((16, 16), v, np.uint8) for v in (1, 2, 3)]
    blob = h264.encode(frames)
    slices = [rbsp for t, _, rbsp in _split_annexb(blob) if t == 5]
    ids = []
    for rbsp in slices:
        r = _BitReader(rbsp)
        r.ue()
        r.ue()
        r.ue()  # first_mb, slice_type, pps_id
        r.u(4)  # frame_num
        ids.append(r.ue())  # idr_pic_id
    assert ids == [0, 1, 0]


# ------------------------------------------------------------- rejection


def test_reject_cabac_pps():
    w = _BitWriter()
    w.ue(0)
    w.ue(0)
    w.u(1, 1)  # entropy_coding_mode_flag = CABAC
    w.u(0, 1)
    w.rbsp_trailing()
    with pytest.raises(H264Error, match="CABAC"):
        h264._parse_pps(w.getvalue())


def test_reject_entropy_mb_when_deblocking_active():
    # hand-build a slice whose first MB is I_4x4 (mb_type 0) inside an
    # I_PCM-carriage PPS: deblocking is implicitly ON there, so the
    # entropy-coded MB must refuse (round 5 decodes CAVLC MBs for real
    # when the stream disables the unimplemented in-loop filter)
    blob = bytearray(h264.encode([np.zeros((16, 16), np.uint8)]))
    units = _split_annexb(bytes(blob))
    sps = h264._parse_sps(units[0][2])
    pps = h264._parse_pps(units[1][2])
    w = _BitWriter()
    w.ue(0)
    w.ue(7)
    w.ue(0)
    w.u(0, 4)
    w.ue(0)
    w.u(0, 2)
    w.se(0)
    w.ue(0)  # mb_type 0 = I_4x4
    w.rbsp_trailing()
    with pytest.raises(H264Error, match="deblocking"):
        h264._decode_slice(w.getvalue(), sps, pps, idr=True, ref_idc=3)


def test_reject_p_slice_and_garbage():
    with pytest.raises(H264Error):
        h264.decode(b"\x00\x01\x02\x03")
    # P slice header (slice_type ue(0))
    blob = h264.encode([np.zeros((16, 16), np.uint8)])
    units = _split_annexb(blob)
    sps = h264._parse_sps(units[0][2])
    pps = h264._parse_pps(units[1][2])
    w = _BitWriter()
    w.ue(0)
    w.ue(0)  # slice_type P
    w.rbsp_trailing()
    with pytest.raises(H264Error, match="I slices"):
        h264._decode_slice(w.getvalue(), sps, pps, idr=False, ref_idc=2)


def test_three_byte_start_codes_accepted():
    blob = h264.encode([np.arange(256, dtype=np.uint8).reshape(16, 16)])
    # rewrite 4-byte start codes as 3-byte ones
    short = blob.replace(b"\x00\x00\x00\x01", b"\x00\x00\x01")
    out, _ = h264.decode(short)
    assert np.array_equal(out[0], np.arange(256, dtype=np.uint8).reshape(16, 16))


def test_decoder_tolerates_poc_type_0_and_sei():
    # a stream from a different (typical) encoder shape: poc_type 0,
    # an SEI NAL between PPS and slice — headers must parse through.
    mb_w = mb_h = 1
    w = _BitWriter()
    w.u(66, 8)
    w.u(0b11000000, 8)
    w.u(30, 8)
    w.ue(0)
    w.ue(0)
    w.ue(0)  # poc_type 0
    w.ue(0)  # log2_max_poc_lsb_minus4
    w.ue(0)
    w.u(0, 1)
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.u(1, 1)
    w.u(1, 1)
    w.u(0, 1)  # no cropping
    w.u(0, 1)  # no VUI
    w.rbsp_trailing()
    sps_rbsp = w.getvalue()
    y = np.arange(256, dtype=np.uint8).reshape(16, 16)
    cb = np.full((8, 8), 90, np.uint8)
    cr = np.full((8, 8), 200, np.uint8)
    sl = _BitWriter()
    sl.ue(0)
    sl.ue(7)
    sl.ue(0)
    sl.u(0, 4)  # frame_num
    sl.ue(0)  # idr_pic_id
    sl.u(0, 4)  # pic_order_cnt_lsb (log2=4)
    sl.u(0, 2)  # dec_ref_pic_marking
    sl.se(0)
    sl.ue(25)
    sl.align_zero()
    sl.bytes_raw(y.tobytes())
    sl.bytes_raw(cb.tobytes())
    sl.bytes_raw(cr.tobytes())
    sl.rbsp_trailing()
    stream = (
        h264._nal(7, 3, sps_rbsp)
        + h264._nal(8, 3, h264._pps_rbsp())
        + h264._nal(6, 0, b"\x05\x01\x00\x80")  # SEI, skipped
        + h264._nal(5, 3, sl.getvalue())
    )
    planes, fps = h264.decode_ycbcr(stream)
    assert fps == 0.0
    yd, cbd, crd = planes[0]
    assert np.array_equal(yd, y)
    assert np.array_equal(cbd, cb)
    assert np.array_equal(crd, cr)
