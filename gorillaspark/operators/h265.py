"""From-scratch HEVC (Rec. ITU-T H.265) Main-profile codec —
formerly the last named media stub on the multimodal surface
(hev1/hvc1 MP4 tracks demuxed fine but their frame decode raised).

Scope (r8): Main profile, 4:2:0, 8-bit, I and P slices —
* NAL layer: Annex-B start codes, the 2-byte H.265 NAL header
  (§7.3.1.2: nal_unit_type(6) / nuh_layer_id(6) / temporal_id(3)),
  emulation-prevention handling shared with h264.py.
* Parameter sets: VPS/SPS/PPS parse + write with profile_tier_level
  (§7.3.3), and the ISO/IEC 14496-15 §8.3.3 HEVCDecoderConfiguration
  Record (hvcC) for hvc1 MP4 tracks.
* Coding structure: CTB 16x16, quadtree split to 8x8 CUs, intra
  part modes 2Nx2N and NxN (four 4x4 PUs at min CU size), residual
  quadtree collapsed to TU == CU (max_transform_hierarchy_depth_intra
  = 0; the NxN intra split forces 4x4 TUs per §7.4.9.8).
* Intra prediction (§8.4.4.2): planar / DC / the 33 angular modes,
  reference-sample substitution and the [1 2 1] smoothing filter.
* Transforms: 4x4 DST-VII for intra luma, DCT-II otherwise
  (§8.6.4), spec dequant chain (levelScale = [40,45,51,57,64,72],
  bdShift = log2TbSize + 3 for 8-bit); cu_transquant_bypass lossless
  CUs (PPS transquant_bypass_enabled_flag) for the exact oracle
  family.
* Entropy: CABAC only (HEVC has no CAVLC slice data). The binary
  arithmetic engine is SHARED with h264_cabac.py — H.265 §9.3.4 is
  the same M-coder — and so is its honesty contract: the
  rangeTabLPS / transIdxLPS tables are REGENERATED from the
  published Marpe/Schwarz/Wiegand design formulas and contexts
  initialize uniformly instead of the spec's literal initValue
  tables (Tables 9-5..9-32 — pure data, unverifiable without
  conformance vectors in this sandbox). Literal CONTEXT-SELECTION
  maps (e.g. the 4x4 significance ctxIdxMap of §9.3.4.2.5) are
  likewise replaced by simple documented position maps. Both sides
  of THIS codec share every replaced table, so round-trips are
  exact, but a third-party HEVC stream WOULD desync — therefore
  decode only accepts streams carrying the gorillaspark SEI marker
  (``_GS_HEVC_UUID``, a prefix-SEI user_data_unregistered payload)
  and rejects foreign HEVC loudly with NotImplementedError rather
  than misdecode it. Substituting the spec's literal initValue /
  ctxIdxMap data is a pure data swap that would restore interop;
  every structural piece (engine, binarizations, syntax order,
  scans, transforms, prediction) is already here.

P and B slices (late r8): TRAIL_R pictures over a POC-keyed DPB
(slice-local short-term RPS: one negative pic for P, one negative
+ one positive for B), cu_skip / merge / AMVP motion derivation
(§8.5.3.2 spatial candidates incl. the second-PU split exclusions
and the §8.5.3.2.4 combined bi-predictive candidates; no TMVP —
SPS flag 0; cross-list AMVP scaled by the exact §8.5.3.2.8
POC-distance formula), inter part modes 2Nx2N / 2NxN / Nx2N + the four
AMP quarter-splits at CB16 (amp_enabled_flag, Table 9-34 bypass
bins),
inter_pred_idc L0/L1/BI with the §8.5.4.2.3.2 bi combiner over
unfinalized 14-bit planes, quarter-pel luma 8-tap + eighth-pel
chroma 4-tap DCT-IF interpolation (§8.5.4.2.2, exact shift chain),
mvd_coding (EG1 bypass) and TU == CU inter residuals under
max_transform_hierarchy_depth_inter = 1 (split_transform_flag
coded 0 — inter TUs legally span PU boundaries, avoiding the
forced §7.4.9.8 RQT split). Decode returns display (POC) order;
the encoder's ``b_frames=True`` codes an I-B-P ladder.

In-loop filters (late r8): deblocking (§8.7.2 — 8-grid edges, bS
from per-cell CU/PU identity + cbf metadata, Table 8-12 beta/tC,
strong/weak luma + bS-2 chroma; PPS signals on/off, lossless keeps
it off) runs first, then SAO (per-CTB band/edge offsets with
merge-left/up, §8.7.3 classification on the deblocked recon); the
filtered picture is the output AND the reference. Lossless slices
opt out of both (they would perturb transquant-bypass exactness).

Deliberately out of scope (reject loudly): PCM, scaling lists,
tiles, WPP, long-term refs, 4:2:2/4:4:4, >8-bit.

Scale note (same contract as h264.py): decode runs per-payload
inside mapInArrow batches on the media surface — embarrassingly
parallel, no shuffle — bounded by the plausibility caps of the
ingestion contract.

Reference parity: the Gorilla reference (burmanm/gorilla-tsc) has no
media surface; this extends SURVEY §2C's multimodal coverage.
"""

from __future__ import annotations

import numpy as np

from .h264 import _Bits, _BitW, _escape, _unescape
from .h264_cabac import _CabacDec, _CabacEnc
from ..codec.native import h265_search_mv_native

# gorillaspark HEVC marker (prefix SEI, user_data_unregistered):
# gates CABAC decode to own streams — see module docstring
_GS_HEVC_UUID = b"gorillaspark-hvc"

# H.265 NAL unit types (Table 7-1)
_NAL_TRAIL_N = 0
_NAL_TRAIL_R = 1
_NAL_IDR_W_RADL = 19
_NAL_IDR_N_LP = 20
_NAL_VPS = 32
_NAL_SPS = 33
_NAL_PPS = 34
_NAL_PREFIX_SEI = 39


# ---------------------------------------------------------------------------
# NAL layer
# ---------------------------------------------------------------------------


def _split_annexb_h265(payload: bytes):
    """Yield (nal_unit_type, nuh_layer_id, temporal_id, rbsp) per
    Annex-B NAL unit. H.265 NAL headers are TWO bytes (§7.3.1.2):
    forbidden_zero_bit(1) nal_unit_type(6) nuh_layer_id(6)
    nuh_temporal_id_plus1(3)."""
    n = len(payload)
    i = 0
    starts = []
    while i + 2 < n:
        if payload[i] == 0 and payload[i + 1] == 0:
            if payload[i + 2] == 1:
                starts.append(i + 3)
                i += 3
                continue
            if i + 3 < n and payload[i + 2] == 0 and payload[i + 3] == 1:
                starts.append(i + 4)
                i += 4
                continue
        i += 1
    if not starts:
        raise ValueError("no Annex-B start code in H.265 stream")
    for si, s in enumerate(starts):
        e = starts[si + 1] - 3 if si + 1 < len(starts) else n
        while e > s and payload[e - 1] == 0:
            # trailing_zero_8bits (and the 4-byte start code's extra 0)
            e -= 1
        nal = payload[s:e]
        if len(nal) < 3:
            raise ValueError("truncated H.265 NAL unit")
        h = (nal[0] << 8) | nal[1]
        if h & 0x8000:
            raise ValueError("forbidden_zero_bit set in NAL header")
        nal_type = (h >> 9) & 0x3F
        layer_id = (h >> 3) & 0x3F
        tid = (h & 7) - 1
        if tid < 0:
            raise ValueError("nuh_temporal_id_plus1 is zero")
        yield nal_type, layer_id, tid, _unescape(nal[2:])


def _nal(nal_type: int, rbsp: bytes, tid: int = 0) -> bytes:
    """Wrap an RBSP as a start-coded H.265 NAL unit."""
    h = (nal_type << 9) | (tid + 1)
    return (b"\x00\x00\x00\x01" + bytes([h >> 8, h & 0xFF])
            + _escape(rbsp))


def _marker_sei() -> bytes:
    """The gorillaspark prefix-SEI NAL: payloadType 5
    (user_data_unregistered), the 16-byte UUID field carrying
    ``_GS_HEVC_UUID`` (§D.2.7)."""
    body = bytes([5, len(_GS_HEVC_UUID)]) + _GS_HEVC_UUID
    return _nal(_NAL_PREFIX_SEI, body + b"\x80")


# ---------------------------------------------------------------------------
# parameter sets
# ---------------------------------------------------------------------------


def _write_ptl(bw: _BitW):
    """profile_tier_level (§7.3.3), maxNumSubLayersMinus1 = 0:
    Main profile (general_profile_idc 1), Main tier, level 3.0."""
    bw.u(0, 2)                   # general_profile_space
    bw.u(0, 1)                   # general_tier_flag
    bw.u(1, 5)                   # general_profile_idc = Main
    bw.u(1 << 30, 32)            # compatibility: flag[1] set
    bw.u(1, 1)                   # general_progressive_source_flag
    bw.u(0, 1)                   # general_interlaced_source_flag
    bw.u(0, 1)                   # general_non_packed_constraint_flag
    bw.u(1, 1)                   # general_frame_only_constraint_flag
    bw.u(0, 32)                  # general_reserved_zero_43bits...
    bw.u(0, 11)                  # ...(43 bits total)
    bw.u(0, 1)                   # general_inbld_flag (reserved)
    bw.u(90, 8)                  # general_level_idc = level 3.0


def _parse_ptl(br: _Bits) -> dict:
    ptl = {
        "profile_space": br.u(2),
        "tier": br.u(1),
        "profile_idc": br.u(5),
        "compat": br.u(32),
    }
    br.u(4)                      # progressive/interlaced/non-packed/frame-only
    br.u(32)
    br.u(11)
    br.u(1)
    ptl["level_idc"] = br.u(8)
    return ptl


def _write_vps(bw: _BitW):
    """video_parameter_set_rbsp (§7.3.2.1), single layer, no
    sub-layers, no timing info."""
    bw.u(0, 4)                   # vps_video_parameter_set_id
    bw.u(3, 2)                   # vps_base_layer_internal/available (reserved 1s)
    bw.u(0, 6)                   # vps_max_layers_minus1
    bw.u(0, 3)                   # vps_max_sub_layers_minus1
    bw.u(1, 1)                   # vps_temporal_id_nesting_flag
    bw.u(0xFFFF, 16)             # vps_reserved_0xffff_16bits
    _write_ptl(bw)
    bw.u(0, 1)                   # vps_sub_layer_ordering_info_present_flag
    bw.ue(0)                     # vps_max_dec_pic_buffering_minus1
    bw.ue(0)                     # vps_max_num_reorder_pics
    bw.ue(0)                     # vps_max_latency_increase_plus1
    bw.u(0, 6)                   # vps_max_layer_id
    bw.ue(0)                     # vps_num_layer_sets_minus1
    bw.u(0, 1)                   # vps_timing_info_present_flag
    bw.u(0, 1)                   # vps_extension_flag
    bw.trailing()


def _parse_vps(br: _Bits) -> dict:
    vps = {"id": br.u(4)}
    br.u(2)
    br.u(6)
    n_sub = br.u(3)
    if n_sub:
        raise NotImplementedError("HEVC sub-layers unsupported")
    br.u(1)
    if br.u(16) != 0xFFFF:
        raise ValueError("vps_reserved_0xffff_16bits mismatch")
    vps["ptl"] = _parse_ptl(br)
    return vps


def _write_sps(bw: _BitW, w: int, h: int, crop=(0, 0, 0, 0)):
    """seq_parameter_set_rbsp (§7.3.2.2) for this codec's fixed
    coding structure: CTB 16, min CB 8, TB 4..16, rqt depth 0,
    4:2:0, 8-bit, no SAO/PCM/scaling lists/VUI. ``crop`` is the
    conformance window (left, right, top, bottom) in luma samples —
    pic_width/height must already be CTB-multiples."""
    if w % 16 or h % 16 or w == 0 or h == 0:
        raise ValueError("SPS dimensions must be non-zero CTB multiples")
    bw.u(0, 4)                   # sps_video_parameter_set_id
    bw.u(0, 3)                   # sps_max_sub_layers_minus1
    bw.u(1, 1)                   # sps_temporal_id_nesting_flag
    _write_ptl(bw)
    bw.ue(0)                     # sps_seq_parameter_set_id
    bw.ue(1)                     # chroma_format_idc = 4:2:0
    bw.ue(w)                     # pic_width_in_luma_samples
    bw.ue(h)                     # pic_height_in_luma_samples
    if any(crop):
        bw.u(1, 1)               # conformance_window_flag
        # window offsets are in chroma units for 4:2:0 (§7.4.3.2)
        for c in crop:
            if c % 2:
                raise ValueError("4:2:0 crop offsets must be even")
            bw.ue(c // 2)
    else:
        bw.u(0, 1)
    bw.ue(0)                     # bit_depth_luma_minus8
    bw.ue(0)                     # bit_depth_chroma_minus8
    bw.ue(4)                     # log2_max_pic_order_cnt_lsb_minus4
    bw.u(1, 1)                   # sps_sub_layer_ordering_info_present_flag
    bw.ue(1)                     # sps_max_dec_pic_buffering_minus1
    bw.ue(0)                     # sps_max_num_reorder_pics
    bw.ue(0)                     # sps_max_latency_increase_plus1
    bw.ue(0)                     # log2_min_luma_coding_block_size_minus3
    bw.ue(1)                     # log2_diff_max_min_luma_coding_block_size
    bw.ue(0)                     # log2_min_luma_transform_block_size_minus2
    bw.ue(2)                     # log2_diff_max_min_luma_transform_block_size
    # depth_inter = 1 so split_transform_flag is CODED (always 0) on
    # inter CUs — TU == CU even for partitioned PUs (legal: inter TUs
    # may span PU boundaries), avoiding the forced interSplitFlag
    # quad-split of §7.4.9.8 that depth 0 would impose
    bw.ue(1)                     # max_transform_hierarchy_depth_inter
    bw.ue(0)                     # max_transform_hierarchy_depth_intra
    bw.u(0, 1)                   # scaling_list_enabled_flag
    bw.u(1, 1)                   # amp_enabled_flag (late r8: AMP)
    bw.u(1, 1)          # sample_adaptive_offset_enabled_flag (late r8)
    bw.u(0, 1)                   # pcm_enabled_flag
    bw.ue(0)                     # num_short_term_ref_pic_sets
    bw.u(0, 1)                   # long_term_ref_pics_present_flag
    bw.u(0, 1)                   # sps_temporal_mvp_enabled_flag
    bw.u(0, 1)                   # strong_intra_smoothing_enabled_flag
    bw.u(0, 1)                   # vui_parameters_present_flag
    bw.u(0, 1)                   # sps_extension_present_flag
    bw.trailing()


def _parse_sps(br: _Bits) -> dict:
    if br.u(4) != 0:
        raise NotImplementedError("non-zero sps_video_parameter_set_id")
    if br.u(3):
        raise NotImplementedError("HEVC sub-layers unsupported")
    br.u(1)
    ptl = _parse_ptl(br)
    sps = {"ptl": ptl, "id": br.ue()}
    chroma = br.ue()
    if chroma != 1:
        raise NotImplementedError(
            f"chroma_format_idc {chroma} unsupported (4:2:0 only)")
    w = br.ue()
    h = br.ue()
    if w == 0 or h == 0 or w > 1 << 16 or h > 1 << 16:
        raise ValueError("implausible SPS dimensions")
    crop = (0, 0, 0, 0)
    if br.u(1):
        crop = tuple(2 * br.ue() for _ in range(4))
    sps.update(w=w, h=h, crop=crop)
    if br.ue() or br.ue():
        raise NotImplementedError("bit depths beyond 8 unsupported")
    sps["log2_max_poc"] = br.ue() + 4
    if sps["log2_max_poc"] > 16:
        raise ValueError("log2_max_pic_order_cnt_lsb out of range")
    if sps["log2_max_poc"] != 8:
        # _parse_slice_header reads slice_pic_order_cnt_lsb as a fixed
        # u(8) (the width our SPS writer always emits); any other
        # width would misparse the rest of the header — reject loudly
        # at the known unsupported field instead (ADVICE r8)
        raise NotImplementedError(
            "only log2_max_pic_order_cnt_lsb == 8 is supported")
    if br.u(1):                  # sub_layer_ordering_info_present
        br.ue(), br.ue(), br.ue()
    min_cb = br.ue() + 3
    ctb = min_cb + br.ue()
    min_tb = br.ue() + 2
    max_tb = min_tb + br.ue()
    if not (3 <= min_cb <= ctb <= 6) or not (2 <= min_tb <= max_tb <= 5):
        raise ValueError("illegal coding/transform block sizes")
    if (min_cb, ctb, min_tb, max_tb) != (3, 4, 2, 4):
        raise NotImplementedError(
            "coding structure beyond CTB16/CB8/TB4..16 unsupported")
    sps.update(log2_ctb=ctb, log2_min_cb=min_cb,
               log2_min_tb=min_tb, log2_max_tb=max_tb)
    if w % (1 << ctb) or h % (1 << ctb):
        raise NotImplementedError("pic size not a CTB multiple")
    sps["max_trafo_depth_inter"] = br.ue()
    sps["max_trafo_depth_intra"] = br.ue()
    if sps["max_trafo_depth_intra"] != 0:
        raise NotImplementedError("residual quadtree depth unsupported")
    if br.u(1):
        raise NotImplementedError("scaling lists unsupported")
    sps["amp"] = br.u(1)         # asymmetric motion partitions
    sps["sao"] = br.u(1)         # sample-adaptive offset
    if br.u(1):
        raise NotImplementedError("PCM unsupported")
    if br.ue():
        raise NotImplementedError("short-term RPS unsupported")
    if br.u(1):
        raise NotImplementedError("long-term ref pics unsupported")
    br.u(1)                      # temporal MVP (inter-only)
    sps["strong_smoothing"] = br.u(1)
    if br.u(1):
        raise NotImplementedError("VUI parsing unsupported")
    if br.u(1):
        raise NotImplementedError("SPS extensions unsupported")
    return sps


def _write_pps(bw: _BitW, qp: int, transquant_bypass: bool = False,
               deblock: bool = False):
    """pic_parameter_set_rbsp (§7.3.2.3): no tiles/WPP, fixed
    chroma QP offsets 0. ``deblock`` enables the in-loop deblocking
    filter by OMITTING the control block (control_present 0 ->
    disabled_flag inferred 0, offsets inferred 0); otherwise the
    r8 disabled form (control present, disabled 1) is kept
    byte-identical."""
    if not 0 <= qp <= 51:
        raise ValueError("qp out of range")
    bw.ue(0)                     # pps_pic_parameter_set_id
    bw.ue(0)                     # pps_seq_parameter_set_id
    bw.u(0, 1)                   # dependent_slice_segments_enabled_flag
    bw.u(0, 1)                   # output_flag_present_flag
    bw.u(0, 3)                   # num_extra_slice_header_bits
    bw.u(0, 1)                   # sign_data_hiding_enabled_flag
    bw.u(0, 1)                   # cabac_init_present_flag
    bw.ue(0)                     # num_ref_idx_l0_default_active_minus1
    bw.ue(0)                     # num_ref_idx_l1_default_active_minus1
    bw.se(qp - 26)               # init_qp_minus26
    bw.u(0, 1)                   # constrained_intra_pred_flag
    bw.u(0, 1)                   # transform_skip_enabled_flag
    bw.u(0, 1)                   # cu_qp_delta_enabled_flag
    bw.se(0)                     # pps_cb_qp_offset
    bw.se(0)                     # pps_cr_qp_offset
    bw.u(0, 1)                   # pps_slice_chroma_qp_offsets_present_flag
    bw.u(0, 1)                   # weighted_pred_flag
    bw.u(0, 1)                   # weighted_bipred_flag
    bw.u(1 if transquant_bypass else 0, 1)  # transquant_bypass_enabled_flag
    bw.u(0, 1)                   # tiles_enabled_flag
    bw.u(0, 1)                   # entropy_coding_sync_enabled_flag
    bw.u(0, 1)                   # pps_loop_filter_across_slices_enabled_flag
    if deblock:
        bw.u(0, 1)               # deblocking_filter_control_present_flag
        # -> pps_deblocking_filter_disabled_flag inferred 0 (ON),
        #    beta/tc offsets inferred 0
    else:
        bw.u(1, 1)               # deblocking_filter_control_present_flag
        bw.u(0, 1)               # deblocking_filter_override_enabled_flag
        bw.u(1, 1)               # pps_deblocking_filter_disabled_flag
    bw.u(0, 1)                   # pps_scaling_list_data_present_flag
    bw.u(0, 1)                   # lists_modification_present_flag
    bw.ue(0)                     # log2_parallel_merge_level_minus2
    bw.u(0, 1)                   # slice_segment_header_extension_present_flag
    bw.u(0, 1)                   # pps_extension_present_flag
    bw.trailing()


def _parse_pps(br: _Bits) -> dict:
    if br.ue() or br.ue():
        raise NotImplementedError("non-zero PPS/SPS ids unsupported")
    if br.u(1):
        raise NotImplementedError("dependent slice segments unsupported")
    br.u(1)                      # output_flag_present
    if br.u(3):
        raise NotImplementedError("extra slice header bits unsupported")
    if br.u(1):
        raise NotImplementedError("sign data hiding unsupported")
    if br.u(1):
        raise NotImplementedError("cabac_init_flag unsupported")
    br.ue(), br.ue()             # default ref idx counts (inter-only)
    pps = {"qp": 26 + br.se()}
    if not 0 <= pps["qp"] <= 51:
        raise ValueError("init_qp out of range")
    br.u(1)                      # constrained_intra_pred (no inter: moot)
    if br.u(1):
        raise NotImplementedError("transform_skip unsupported")
    if br.u(1):
        raise NotImplementedError("cu_qp_delta unsupported")
    if br.se() or br.se():
        raise NotImplementedError("chroma QP offsets unsupported")
    if br.u(1):
        raise NotImplementedError("slice chroma QP offsets unsupported")
    br.u(1), br.u(1)             # weighted pred flags (inter-only)
    pps["tq_bypass"] = br.u(1)
    if br.u(1):
        raise NotImplementedError("tiles unsupported")
    if br.u(1):
        raise NotImplementedError("wavefront (WPP) unsupported")
    br.u(1)                      # loop_filter_across_slices
    if br.u(1):                  # deblocking_filter_control_present
        if br.u(1):
            raise NotImplementedError("deblocking override unsupported")
        pps["deblock"] = 0 if br.u(1) else None
        if pps["deblock"] is None:
            # disabled_flag 0 with explicit offsets would follow
            raise NotImplementedError(
                "explicit deblocking offsets unsupported (this "
                "codec signals filter-on by omitting the control "
                "block: offsets inferred 0)")
    else:
        pps["deblock"] = 1       # disabled_flag inferred 0: filter ON
    if br.u(1):
        raise NotImplementedError("PPS scaling lists unsupported")
    br.u(1)                      # lists_modification (inter-only)
    br.ue()                      # log2_parallel_merge_level (inter-only)
    if br.u(1):
        raise NotImplementedError("slice header extensions unsupported")
    return pps


def _write_slice_header(bw: _BitW, qp_delta: int = 0,
                        slice_type: int = 2, poc_lsb: int = 0,
                        d0: int = 1, d1: int = 1,
                        sao: bool = False):
    """slice_segment_header (§7.3.6.1) for a one-segment slice under
    this codec's fixed SPS/PPS. slice_type 2 = IDR I (byte-identical
    to the r8 intra-only form); slice_type 1 = TRAIL P referencing
    poc - d0; slice_type 0 = TRAIL B referencing poc - d0 (L0) and
    poc + d1 (L1) — both via a slice-local short-term RPS with
    every pic used_by_curr."""
    bw.u(1, 1)                   # first_slice_segment_in_pic_flag
    if slice_type == 2:
        bw.u(0, 1)               # no_output_of_prior_pics_flag (IDR)
    bw.ue(0)                     # slice_pic_parameter_set_id
    bw.ue(slice_type)            # slice_type
    if slice_type != 2:
        bw.u(poc_lsb & 0xFF, 8)  # slice_pic_order_cnt_lsb (log2 = 8)
        bw.u(0, 1)               # short_term_ref_pic_set_sps_flag
        # st_ref_pic_set(0): sps holds none, so no inter-RPS pred flag
        bw.ue(1)                 # num_negative_pics
        bw.ue(1 if slice_type == 0 else 0)   # num_positive_pics
        bw.ue(d0 - 1)            # delta_poc_s0_minus1[0]
        bw.u(1, 1)               # used_by_curr_pic_s0_flag[0]
        if slice_type == 0:
            bw.ue(d1 - 1)        # delta_poc_s1_minus1[0]
            bw.u(1, 1)           # used_by_curr_pic_s1_flag[0]
        # long_term off; sps_temporal_mvp off -> no slice TMVP flag
    # SPS sample_adaptive_offset_enabled_flag is 1 (late r8), so the
    # per-slice opt-in flags are always present; lossless slices
    # write 0 (SAO would perturb the transquant-bypass exactness)
    bw.u(1 if sao else 0, 1)     # slice_sao_luma_flag
    bw.u(1 if sao else 0, 1)     # slice_sao_chroma_flag
    if slice_type in (0, 1):
        bw.u(0, 1)               # num_ref_idx_active_override_flag
        # lists_modification absent (flag off, NumPicTotalCurr small);
        # cabac_init absent; no collocated (TMVP off); no weight table
        if slice_type == 0:
            bw.u(0, 1)           # mvd_l1_zero_flag
        bw.ue(0)                 # five_minus_max_num_merge_cand -> 5
    bw.se(qp_delta)              # slice_qp_delta
    # (pps deblocking: disabled, not overridable; SAO: off)
    bw.trailing()                # byte_alignment before slice data


def _parse_slice_header(br: _Bits, pps: dict, is_idr: bool = True,
                        sao_present: bool = True) -> dict:
    if not br.u(1):
        raise NotImplementedError("multi-segment slices unsupported")
    if is_idr:
        br.u(1)                  # no_output_of_prior_pics_flag
    if br.ue() != 0:
        raise NotImplementedError("non-zero slice PPS id unsupported")
    st = br.ue()
    if st not in (0, 1, 2):
        raise ValueError(f"illegal slice_type {st}")
    if is_idr and st != 2:
        raise ValueError("IDR access unit with a non-I slice")
    sh = {"type": st, "poc_lsb": 0, "max_merge": 5,
          "d0": 0, "d1": 0}
    if not is_idr:
        sh["poc_lsb"] = br.u(8)  # log2_max_poc fixed at 8 by our SPS
        if br.u(1):
            raise NotImplementedError("SPS-indexed short-term RPS "
                                      "unsupported")
        n_neg, n_pos = br.ue(), br.ue()
        if n_neg != 1 or n_pos > 1:
            raise NotImplementedError(
                "DPB shapes beyond one negative + at most one "
                "positive reference unsupported")
        sh["d0"] = br.ue() + 1
        if not br.u(1):
            raise NotImplementedError("unused reference pic in RPS")
        if n_pos:
            sh["d1"] = br.ue() + 1
            if not br.u(1):
                raise NotImplementedError("unused reference pic in RPS")
        if st == 0 and not n_pos:
            raise ValueError("B slice without a positive reference")
    if sao_present:
        sh["sao_luma"] = br.u(1)
        sh["sao_chroma"] = br.u(1)
    else:
        sh["sao_luma"] = sh["sao_chroma"] = 0
    if st in (0, 1):
        if br.u(1):
            raise NotImplementedError(
                "num_ref_idx_active_override unsupported")
        if st == 0 and br.u(1):
            raise NotImplementedError("mvd_l1_zero unsupported")
        five = br.ue()
        if five > 4:
            raise ValueError("five_minus_max_num_merge_cand out of range")
        sh["max_merge"] = 5 - five
    qp = pps["qp"] + br.se()
    if not 0 <= qp <= 51:
        raise ValueError("slice QP out of range")
    sh["qp"] = qp
    # byte_alignment: alignment_bit_equal_to_one + zeros
    if br.u(1) != 1:
        raise ValueError("slice header alignment bit missing")
    while br.pos % 8:
        if br.u(1):
            raise ValueError("slice header alignment padding not zero")
    return sh


# ---------------------------------------------------------------------------
# hvcC (HEVCDecoderConfigurationRecord, ISO/IEC 14496-15 §8.3.3)
# ---------------------------------------------------------------------------


def hevc_hvcc_config(annexb: bytes) -> bytes:
    """Build the hvcC box BODY from the VPS/SPS/PPS NALs of an
    Annex-B access unit. Length field size 4; parameter sets stored
    in-record per type (array_completeness = 1)."""
    psets: dict[int, list[bytes]] = {_NAL_VPS: [], _NAL_SPS: [],
                                     _NAL_PPS: []}
    sps = None
    for nal_type, _lid, _tid, rbsp in _split_annexb_h265(annexb):
        if nal_type in psets:
            psets[nal_type].append(_raw_nal(nal_type, rbsp))
        if nal_type == _NAL_SPS:
            sps = _parse_sps(_Bits(rbsp))
    if not psets[_NAL_SPS] or not psets[_NAL_PPS]:
        raise ValueError("Annex-B stream lacks SPS or PPS")
    ptl = sps["ptl"]
    out = bytearray()
    out.append(1)                                    # configurationVersion
    out.append((ptl["profile_space"] << 6) | (ptl["tier"] << 5)
               | ptl["profile_idc"])
    out += ptl["compat"].to_bytes(4, "big")          # compatibility flags
    out += b"\xb0\x00\x00\x00\x00\x00"               # constraint flags
    out.append(ptl["level_idc"])
    out += b"\xf0\x00"                               # min_spatial_seg
    out.append(0xFC)                                 # parallelismType
    out.append(0xFC | 1)                             # chromaFormat 4:2:0
    out.append(0xF8)                                 # bitDepthLumaMinus8
    out.append(0xF8)                                 # bitDepthChromaMinus8
    out += b"\x00\x00"                               # avgFrameRate
    out.append(3)                                    # lengthSizeMinusOne=3
    arrays = [(t, psets[t]) for t in (_NAL_VPS, _NAL_SPS, _NAL_PPS)
              if psets[t]]
    out.append(len(arrays))
    for t, nals in arrays:
        out.append(0x80 | t)                         # completeness | type
        out += len(nals).to_bytes(2, "big")
        for nal in nals:
            out += len(nal).to_bytes(2, "big") + nal
    return bytes(out)


def _raw_nal(nal_type: int, rbsp: bytes, tid: int = 0) -> bytes:
    """Escaped NAL unit WITHOUT a start code (hvcC / sample body)."""
    h = (nal_type << 9) | (tid + 1)
    return bytes([h >> 8, h & 0xFF]) + _escape(rbsp)


def hevc_to_hvc1_sample(annexb: bytes) -> bytes:
    """Length-prefix (4-byte) the non-parameter-set NALs of an
    Annex-B access unit — the hvc1 MP4 sample payload."""
    out = bytearray()
    for nal_type, _lid, tid, rbsp in _split_annexb_h265(annexb):
        if nal_type in (_NAL_VPS, _NAL_SPS, _NAL_PPS):
            continue
        nal = _raw_nal(nal_type, rbsp, tid)
        out += len(nal).to_bytes(4, "big") + nal
    if not out:
        raise ValueError("access unit has no sample NALs")
    return bytes(out)


def hevc_gop_to_hvc1_samples(annexb: bytes):
    """Split a GOP Annex-B stream into per-access-unit hvc1 sample
    payloads plus the shared hvcC record body: parameter sets go to
    the record, non-slice NALs (SEI) attach to the following slice,
    and each slice NAL closes one sample."""
    hvcc = hevc_hvcc_config(annexb)
    samples = []
    pending = bytearray()
    for nal_type, _lid, tid, rbsp in _split_annexb_h265(annexb):
        if nal_type in (_NAL_VPS, _NAL_SPS, _NAL_PPS):
            continue
        nal = _raw_nal(nal_type, rbsp, tid)
        pending += len(nal).to_bytes(4, "big") + nal
        if nal_type < 32:                      # VCL NAL ends the AU
            samples.append(bytes(pending))
            pending.clear()
    if pending:
        raise ValueError("trailing non-VCL NALs after the last slice")
    if not samples:
        raise ValueError("stream has no coded slices")
    return samples, hvcc


def hevc_sample_to_annexb(sample: bytes, hvcc: bytes) -> bytes:
    """Rebuild a decodable Annex-B access unit from a
    length-prefixed hvc1 sample plus its track's hvcC record."""
    if len(hvcc) < 23 or hvcc[0] != 1:
        raise ValueError("corrupt hvcC record")
    length_size = (hvcc[21] & 3) + 1
    n_arrays = hvcc[22]
    sc = b"\x00\x00\x00\x01"
    out = bytearray()
    pos = 23
    for _ in range(n_arrays):
        if pos + 3 > len(hvcc):
            raise ValueError("truncated hvcC arrays")
        n_nals = int.from_bytes(hvcc[pos + 1:pos + 3], "big")
        pos += 3
        for _ in range(n_nals):
            if pos + 2 > len(hvcc):
                raise ValueError("truncated hvcC NAL length")
            ln = int.from_bytes(hvcc[pos:pos + 2], "big")
            pos += 2
            if ln == 0 or pos + ln > len(hvcc):
                raise ValueError("corrupt hvcC NAL")
            out += sc + hvcc[pos:pos + ln]
            pos += ln
    p = 0
    while p < len(sample):
        if p + length_size > len(sample):
            raise ValueError("truncated hvc1 sample length prefix")
        ln = int.from_bytes(sample[p:p + length_size], "big")
        p += length_size
        if ln == 0 or p + ln > len(sample):
            raise ValueError("corrupt hvc1 sample NAL length")
        out += sc + sample[p:p + ln]
        p += ln
    return bytes(out)


# ---------------------------------------------------------------------------
# CABAC context allocation (uniform init — see module docstring)
# ---------------------------------------------------------------------------

_SPLIT_CU = 0       # 3: + (depth_left > d) + (depth_above > d)
_TQ_BYPASS = 3      # 1: cu_transquant_bypass_flag
_PART_MODE = 4      # 1: intra part_mode at min CB size
_PREV_INTRA = 5     # 1: prev_intra_luma_pred_flag
_CHROMA_MODE = 6    # 1: intra_chroma_pred_mode bin0
_CBF_LUMA = 7       # 2: trafoDepth == 0 ? 1 : 0
_CBF_CHROMA = 9     # 2: min(trafoDepth, 1)
_LAST_X = 11        # 18: luma 15 (size-offset formula) + chroma 3
_LAST_Y = 29        # 18
_CSBF = 47          # 4: (chroma ? 2 : 0) + min(csbf_right+csbf_below, 1)
_SIG = 51           # 19: luma 0..10, chroma 11..18 (see _sig_ctx)
_GT1 = 70           # 24: luma sets 0..3, chroma sets 4..5, x4 each
_GT2 = 94           # 6: one per ctxSet
# inter (P slices, r8):
_CU_SKIP = 100      # 3: + left_skip + above_skip (§9.3.4.2.2)
_PRED_MODE = 103    # 1: pred_mode_flag
_PART_INTER = 104   # 2: inter part_mode bins 0/1 ("1"/"01"/"00")
_MERGE_FLAG = 106   # 1
_MERGE_IDX = 107    # 1: bin0 (rest bypass, TR cMax = MaxMerge-1)
_MVD_GR0 = 108      # 1: abs_mvd_greater0_flag (shared across comps)
_MVD_GR1 = 109      # 1: abs_mvd_greater1_flag
_MVP_FLAG = 110     # 1: mvp_l0_flag
_RQT_ROOT = 111     # 1: rqt_root_cbf
_SPLIT_TF = 112     # 3: split_transform_flag, ctxInc 5 - log2TrafoSize
_INTER_DIR = 115    # 2: inter_pred_idc bins ("1"=BI / "0x"=L0|L1)
_SAO_MERGE = 117    # 1: sao_merge_left/up_flag (shared, §9.3.4.2.2)
_SAO_TYPE = 118     # 1: sao_type_idx bin0 (bin1 bypass)
N_CTX5 = 119


class _Ctx5:
    """HEVC context variables: pStateIdx + valMPS, uniform init
    (same honesty contract as h264_cabac._Ctx — the spec's literal
    initValue tables are data this sandbox cannot validate)."""

    __slots__ = ("state", "mps")

    def __init__(self):
        self.state = bytearray(N_CTX5)
        self.mps = bytearray(N_CTX5)


# ---------------------------------------------------------------------------
# scan orders (§6.5.3): up-right diagonal / horizontal / vertical
# ---------------------------------------------------------------------------


def _scan_order(n: int, idx: int):
    """Scan position list [(x, y), ...] for an n×n block.
    idx: 0 diagonal (up-right), 1 horizontal, 2 vertical."""
    if idx == 1:
        return [(x, y) for y in range(n) for x in range(n)]
    if idx == 2:
        return [(x, y) for x in range(n) for y in range(n)]
    out = []
    for d in range(2 * n - 1):
        # up-right: start at the bottom of the diagonal
        for x in range(max(0, d - n + 1), min(d, n - 1) + 1):
            y = d - x
            if y < n:
                out.append((x, y))
    return out


_SCAN4 = {i: _scan_order(4, i) for i in range(3)}


def _scan_idx(intra_mode: int, log2_tb: int, is_luma: bool) -> int:
    """Mode-dependent coefficient scan (§7.4.9.11): 4x4/8x8 luma
    (and 4x4 chroma) intra TBs scan vertically for near-horizontal
    modes 6..14 and horizontally for near-vertical modes 22..30."""
    if log2_tb > 3 or (not is_luma and log2_tb > 2):
        return 0
    if 6 <= intra_mode <= 14:
        return 2
    if 22 <= intra_mode <= 30:
        return 1
    return 0


# ---------------------------------------------------------------------------
# transforms (§8.6.4) and quantization (§8.6.3)
# ---------------------------------------------------------------------------
# DCT-II basis: even rows fold recursively from the half-size matrix
# (exact cosine identity — no data); odd rows take the spec's
# published integer vectors g4/g8/g16 (Rec. H.265 §8.6.4.2, the same
# public-table transcription contract as h264.py's VLC tables).

_G = {4: [83, 36], 8: [89, 75, 50, 18],
      16: [90, 87, 80, 70, 57, 43, 25, 9]}


def _dct_matrix(n: int) -> np.ndarray:
    if n == 2:
        return np.array([[64, 64], [64, -64]], dtype=np.int64)
    half = _dct_matrix(n // 2)
    m = np.zeros((n, n), dtype=np.int64)
    for k in range(n // 2):
        m[2 * k, :n // 2] = half[k]
        m[2 * k, n // 2:] = half[k][::-1]
    g = _G[n]
    for k in range(n // 2):
        r = 2 * k + 1
        for c in range(n):
            # angle as odd multiples of pi/(2n): cos((2c+1)r * pi/2n)
            a = ((2 * c + 1) * r) % (4 * n)
            if a > 2 * n:
                a = 4 * n - a
            s = 1
            if a > n:
                a = 2 * n - a
                s = -1
            m[r, c] = s * g[(a - 1) // 2]
    return m


_DCT = {n: _dct_matrix(n) for n in (4, 8, 16)}
# DST-VII for 4x4 intra luma (§8.6.4.1, published integer matrix)
_DST4 = np.array([[29, 55, 74, 84],
                  [74, 74, 0, -74],
                  [84, -29, -74, 55],
                  [55, -84, 74, -29]], dtype=np.int64)

_LEVEL_SCALE = [40, 45, 51, 57, 64, 72]       # dequant (§8.6.3)
_QUANT_SCALE = [26214, 23302, 20560, 18396, 16384, 14564]


def _tb_matrix(n: int, is_luma: bool, intra: bool = True) -> np.ndarray:
    if n == 4 and is_luma and intra:
        return _DST4
    return _DCT[n]


def _dequant(levels: np.ndarray, qp: int, log2_tb: int) -> np.ndarray:
    """§8.6.3 scaling (no scaling lists: m = 16 flat)."""
    bd_shift = log2_tb + 3                     # bitDepth 8: 8 + log2 - 5
    scale = _LEVEL_SCALE[qp % 6] << (qp // 6)
    d = (levels * scale * 16 + (1 << (bd_shift - 1))) >> bd_shift
    return np.clip(d, -32768, 32767)


def _inv_transform(coefs: np.ndarray, m: np.ndarray) -> np.ndarray:
    """Two-stage inverse (§8.6.4.2): vertical then horizontal,
    shifts 7 and 12 (8-bit), 16-bit clamp between stages."""
    e = (m.T @ coefs + 64) >> 7
    e = np.clip(e, -32768, 32767)
    r = (e @ m + 2048) >> 12
    return np.clip(r, -32768, 32767)


def _fwd_transform(res: np.ndarray, m: np.ndarray, log2_tb: int) -> np.ndarray:
    """Encoder forward transform (HM-style shifts: log2N-1, log2N+6)."""
    s1 = log2_tb - 1
    s2 = log2_tb + 6
    t = (m @ res + (1 << (s1 - 1))) >> s1
    return (t @ m.T + (1 << (s2 - 1))) >> s2


def _quant(coefs: np.ndarray, qp: int, log2_tb: int) -> np.ndarray:
    """Encoder quantization (intra rounding offset 1/3)."""
    qbits = 21 + qp // 6 - log2_tb
    f = _QUANT_SCALE[qp % 6]
    off = (1 << qbits) // 3
    mag = (np.abs(coefs) * f + off) >> qbits
    return np.where(coefs < 0, -mag, mag)


def _chroma_qp(qp: int) -> int:
    """Luma-to-chroma QP map (§8.6.1 Table 8-10, 4:2:0)."""
    if qp < 30:
        return qp
    if qp > 43:
        return qp - 6
    return [29, 30, 31, 32, 33, 33, 34, 34, 35, 35, 36, 36, 37, 37][qp - 30]


# ---------------------------------------------------------------------------
# intra prediction (§8.4.4.2)
# ---------------------------------------------------------------------------

# intraPredAngle per angular mode 2..34 (§8.4.4.2.6 Table 8-5,
# published spec table — transcription with citation, the same
# contract as h264.py's VLC tables) and invAngle for the negative
# angles (Table 8-6).
_ANGLE = [32, 26, 21, 17, 13, 9, 5, 2, 0, -2, -5, -9, -13, -17, -21,
          -26, -32, -26, -21, -17, -13, -9, -5, -2, 0, 2, 5, 9, 13,
          17, 21, 26, 32]
_INV_ANGLE = {-2: -4096, -5: -1638, -9: -910, -13: -630, -17: -482,
              -21: -390, -26: -315, -32: -256}


def _gather_refs(plane: np.ndarray, avail: np.ndarray, x0: int,
                 y0: int, n: int, g: int = 4):
    """Reference sample derivation (§8.4.4.2.2): the 4n+1 neighbours
    p[-1][-1..2n-1] (left column) and p[-1..2n-1][-1] (top row) with
    substitution for unavailable samples. ``avail`` is the decoded
    mask at 4x4-LUMA granularity; ``g`` maps plane coordinates onto
    it (4 for the luma plane, 2 for the half-resolution chroma
    planes). Returns (left[2n+1], top[2n+1]) with the shared corner
    at index 0."""
    H, W = plane.shape
    left = np.full(2 * n + 1, -1, dtype=np.int64)
    top = np.full(2 * n + 1, -1, dtype=np.int64)
    if x0 > 0 and y0 > 0 and avail[(y0 - 1) // g, (x0 - 1) // g]:
        left[0] = top[0] = plane[y0 - 1, x0 - 1]
    # vectorized neighbour walk: the left column reads (x0-1, y0+i)
    # for i < min(2n, H-y0), the top row (x0+i, y0-1) for
    # i < min(2n, W-x0); availability comes from the 4x4-granular
    # mask exactly as the scalar ok() did
    if x0 > 0 and y0 < H:
        kk = min(2 * n, H - y0)
        av = avail[(y0 + np.arange(kk)) // g, (x0 - 1) // g] \
            .astype(bool)
        vals = plane[y0:y0 + kk, x0 - 1]
        left[1:1 + kk][av] = vals[av]
    if y0 > 0 and x0 < W:
        kk = min(2 * n, W - x0)
        av = avail[(y0 - 1) // g, (x0 + np.arange(kk)) // g] \
            .astype(bool)
        vals = plane[y0 - 1, x0:x0 + kk]
        top[1:1 + kk][av] = vals[av]
    # substitution (§8.4.4.2.2): if nothing available -> 128; else
    # scan from the bottom-left end upward through the corner and
    # across the top, propagating the previous value (vectorized as a
    # last-valid-index maximum scan — identical fill values)
    seq = np.concatenate([left[::-1], top[1:]])     # bottom-left..top-right
    valid = seq >= 0
    if not valid.any():
        seq[:] = 128
    else:
        first = int(np.argmax(valid))
        seq[:first] = seq[first]
        idx = np.where(valid, np.arange(seq.size), 0)
        idx[:first + 1] = np.arange(first + 1)
        np.maximum.accumulate(idx, out=idx)
        seq = seq[idx]
    left = seq[:2 * n + 1][::-1].copy()
    top = seq[2 * n:].copy()
    top[0] = left[0]
    return left, top


def _filter_refs(left: np.ndarray, top: np.ndarray):
    """[1 2 1] intra reference smoothing (§8.4.4.2.3) — endpoints
    (bottom-left-most and top-right-most samples) pass unfiltered."""
    seq = np.concatenate([left[::-1], top[1:]]).astype(np.int64)
    sm = seq.copy()
    sm[1:-1] = (seq[:-2] + 2 * seq[1:-1] + seq[2:] + 2) >> 2
    n2 = len(left)
    fl = sm[:n2][::-1].copy()
    ft = sm[n2 - 1:].copy()
    return fl, ft


def _use_filter(mode: int, n: int, is_luma: bool) -> bool:
    """filterFlag (§8.4.4.2.3): luma only, never for DC or 4x4;
    size thresholds 7 (8x8) / 1 (16x16) on the distance to the
    pure horizontal/vertical modes; planar always filters at >4."""
    if not is_luma or n == 4 or mode == 1:
        return False
    if mode == 0:
        return True
    dist = min(abs(mode - 26), abs(mode - 10))
    return dist > (7 if n == 8 else 1)


def _pred_intra(left: np.ndarray, top: np.ndarray, mode: int, n: int,
                is_luma: bool) -> np.ndarray:
    """Predict an n×n block from (possibly filtered) reference
    arrays. left/top are length 2n+1 with the corner at index 0."""
    out = np.empty((n, n), dtype=np.int64)
    if mode == 0:                                 # planar (§8.4.4.2.4)
        l = left[1:n + 1]
        t = top[1:n + 1]
        tr = top[n + 1] if len(top) > n + 1 else top[n]
        bl = left[n + 1] if len(left) > n + 1 else left[n]
        x = np.arange(n)
        y = np.arange(n)
        # same per-element integer chain as the scalar row loop
        return ((n - 1 - x)[None, :] * l[:, None]
                + (x + 1)[None, :] * tr
                + (n - 1 - y)[:, None] * t[None, :]
                + (y + 1)[:, None] * bl + n) >> (int(np.log2(n)) + 1)
    if mode == 1:                                 # DC (§8.4.4.2.5)
        dc = (int(left[1:n + 1].sum() + top[1:n + 1].sum()) + n) >> \
            (int(np.log2(n)) + 1)
        out[:] = dc
        if is_luma and n < 32:
            # DC boundary smoothing
            out[0, 0] = (left[1] + 2 * dc + top[1] + 2) >> 2
            out[0, 1:] = (top[2:n + 1] + 3 * dc + 2) >> 2
            out[1:, 0] = (left[2:n + 1] + 3 * dc + 2) >> 2
        return out
    ang = _ANGLE[mode - 2]
    if mode >= 18:                                # vertical-ish
        main = top
        side = left
    else:                                         # horizontal-ish: swap
        main = left
        side = top
    # extended main reference (§8.4.4.2.6): ref[x] for x in -n..2n
    ref = np.zeros(3 * n + 1, dtype=np.int64)     # index x+n
    ref[n:] = main[:2 * n + 1]
    if ang < 0:
        inv = _INV_ANGLE[ang]
        last = (n * ang) >> 5
        xe = np.arange(-1, last - 1, -1)
        ref[xe + n] = side[np.minimum((xe * inv + 128) >> 8, 2 * n)]
    # all rows at once: idx/fact per row, gathered base/next slices;
    # the where() picks the unfiltered row exactly where fact == 0
    # (ref[pos + 1] is clamped there — never read, idx == n forces
    # fact == 0). Same integer arithmetic as the scalar row loop.
    yv = np.arange(1, n + 1)
    idx = (yv * ang) >> 5
    fact = (yv * ang) & 31
    pos = n + 1 + idx[:, None] + np.arange(n)[None, :]
    base = ref[pos]
    nxt = ref[np.minimum(pos + 1, 3 * n)]
    pr = np.where(fact[:, None],
                  ((32 - fact)[:, None] * base
                   + fact[:, None] * nxt + 16) >> 5,
                  base)
    if mode >= 18:
        out = pr
        if mode == 26 and is_luma and n < 32:     # vertical edge filter
            out = pr.copy()
            out[:, 0] = np.clip(
                top[1] + ((left[1:n + 1] - left[0]) >> 1), 0, 255)
    else:
        out = pr.T.copy()
        if mode == 10 and is_luma and n < 32:     # horizontal edge filter
            out[0, :] = np.clip(
                left[1] + ((top[1:n + 1] - top[0]) >> 1), 0, 255)
    return out


def _mpm_list(modes: np.ndarray, bx: int, by: int, ctb_log2: int):
    """The 3 most-probable-mode candidates (§8.4.2). ``modes`` is the
    per-4x4 luma mode grid (-1 where not intra-decoded); above
    candidates outside the current CTB row are unavailable."""
    cand_a = 1                                   # DC when unavailable
    if bx > 0 and modes[by, bx - 1] >= 0:
        cand_a = int(modes[by, bx - 1])
    cand_b = 1
    if by > 0 and modes[by - 1, bx] >= 0 and \
            (by * 4) % (1 << ctb_log2) != 0:
        cand_b = int(modes[by - 1, bx])
    if cand_a == cand_b:
        if cand_a < 2:
            return [0, 1, 26]
        return [cand_a, 2 + ((cand_a + 29) % 32), 2 + ((cand_a - 1) % 32)]
    third = 0 if 0 not in (cand_a, cand_b) else \
        (1 if 1 not in (cand_a, cand_b) else 26)
    return [cand_a, cand_b, third]


# ---------------------------------------------------------------------------
# residual coding (§7.3.8.11) — shared scan/context derivations
# ---------------------------------------------------------------------------

# last_sig_coeff group binarization (§9.3.3.2): groupIdx / minInGroup
_GROUP_IDX = [0, 1, 2, 3, 4, 4, 5, 5, 6, 6, 6, 6, 7, 7, 7, 7]
_MIN_IN_GROUP = [0, 1, 2, 3, 4, 6, 8, 12]


def _tb_scans(log2_tb: int, scan_idx: int):
    """(positions, sub-blocks) for an n×n TB: ``positions`` maps
    overall scan index -> (x, y) — sub-blocks in scan order, 16
    positions per sub-block in the same scan — and ``sub_blocks``
    is the sub-block coordinate list."""
    n = 1 << log2_tb
    if n == 4:
        return list(_SCAN4[scan_idx]), [(0, 0)]
    sbs = _scan_order(n // 4, scan_idx)
    inner = _SCAN4[scan_idx]
    pos = [(sx * 4 + x, sy * 4 + y) for sx, sy in sbs for x, y in inner]
    return pos, sbs


def _sig_ctx(x: int, y: int, log2_tb: int, is_luma: bool,
             prev_csbf: int, sb_idx: int) -> int:
    """significant_coeff_flag ctxIdx. The neighbour-sub-block
    pattern rules are the spec's (§9.3.4.2.5 formulas); the 4x4
    ctxIdxMap literal (Table 9-39) is replaced by a documented
    quadrant map (same honesty contract as the probability tables)."""
    base = _SIG if is_luma else _SIG + 11
    if x == 0 and y == 0:
        return base                       # DC context
    if log2_tb == 2:
        return base + 1 + (((y >> 1) << 1) | (x >> 1))
    xp, yp = x & 3, y & 3
    if prev_csbf == 0:
        s = 2 if xp + yp == 0 else (1 if xp + yp < 3 else 0)
    elif prev_csbf == 1:
        s = 2 if yp == 0 else (1 if yp == 1 else 0)
    elif prev_csbf == 2:
        s = 2 if xp == 0 else (1 if xp == 1 else 0)
    else:
        s = 2
    if is_luma:
        return base + 5 + (0 if sb_idx == 0 else 3) + s
    return base + 5 + s


def _last_ctx(bin_idx: int, log2_tb: int, is_luma: bool, base: int) -> int:
    """last_sig_coeff_{x,y}_prefix ctxIdx (§9.3.4.2.3 formulas)."""
    if is_luma:
        off = 3 * (log2_tb - 2) + ((log2_tb - 1) >> 2)
        shift = (log2_tb + 1) >> 2
    else:
        off = 15
        shift = log2_tb - 2
    return base + off + (bin_idx >> shift)


def _code_last_prefix(x, ctx, log2_tb: int, is_luma: bool,
                      base: int, v_in=None):
    """Code/parse one last-coordinate: TR prefix over group indices
    (ctx bins) + FL bypass suffix. Encoder: x=_CabacEnc, v = value.
    Decoder: x=_CabacDec, v ignored, returns value."""
    cmax = (log2_tb << 1) - 1
    enc = v_in is not None
    if enc:
        g = _GROUP_IDX[v_in]
        for i in range(g):
            x.bit(ctx, _last_ctx(i, log2_tb, is_luma, base), 1)
        if g < cmax:
            x.bit(ctx, _last_ctx(g, log2_tb, is_luma, base), 0)
        if g > 3:
            nbits = (g >> 1) - 1
            suf = v_in - _MIN_IN_GROUP[g]
            for i in range(nbits - 1, -1, -1):
                x.bypass((suf >> i) & 1)
        return v_in
    g = 0
    while g < cmax and x.bit(ctx, _last_ctx(g, log2_tb, is_luma, base)):
        g += 1
    if g <= 3:
        return g
    return _MIN_IN_GROUP[g] + x.bypass_n((g >> 1) - 1)


def _code_remaining(x, rice: int, v=None) -> int:
    """coeff_abs_level_remaining (§9.3.3.13 binarization): truncated
    Rice prefix (quotients 0..2) + suffix; quotient >= 3 escapes to
    exp-Golomb of order rice+1."""
    if v is not None:
        q = v >> rice
        if q < 3:
            for _ in range(q):
                x.bypass(1)
            x.bypass(0)
            for i in range(rice - 1, -1, -1):
                x.bypass((v >> i) & 1)
        else:
            x.bypass(1), x.bypass(1), x.bypass(1)
            rem = v - (3 << rice)
            k = rice + 1
            while rem >= (1 << k):
                x.bypass(1)
                rem -= 1 << k
                k += 1
            x.bypass(0)
            for i in range(k - 1, -1, -1):
                x.bypass((rem >> i) & 1)
        return v
    q = 0
    while q < 3 and x.bypass():
        q += 1
    if q < 3:
        return (q << rice) + x.bypass_n(rice)
    k = rice + 1
    v = 3 << rice
    while x.bypass():
        v += 1 << k
        k += 1
        if k > 30:
            raise ValueError("coeff_abs_level_remaining overflow")
    return v + x.bypass_n(k)


def _enc_residual5(enc: _CabacEnc, ctx: _Ctx5, coefs: np.ndarray,
                   log2_tb: int, is_luma: bool, scan_idx: int):
    """Encode one TB's residual_coding() — ``coefs`` is the n×n
    level matrix [y][x] with at least one non-zero."""
    n = 1 << log2_tb
    pos, sbs = _tb_scans(log2_tb, scan_idx)
    n_sb = len(sbs)
    sb_at = {sb: i for i, sb in enumerate(sbs)}
    last = max(s for s, (px, py) in enumerate(pos) if coefs[py, px])
    lx, ly = pos[last]
    if scan_idx == 2:
        lx, ly = ly, lx
    _code_last_prefix(enc, ctx, log2_tb, is_luma, _LAST_X, v_in=lx)
    _code_last_prefix(enc, ctx, log2_tb, is_luma, _LAST_Y, v_in=ly)
    last_sb = last >> 4
    csbf = np.zeros((n // 4, n // 4), dtype=bool)
    for s in range(last + 1):
        px, py = pos[s]
        if coefs[py, px]:
            csbf[py >> 2, px >> 2] = True
    prev_c1 = 1
    for si in range(last_sb, -1, -1):
        sx, sy = sbs[si]
        infer_dc = False
        if si == last_sb or si == 0:
            coded_sb = True
        else:
            coded_sb = bool(csbf[sy, sx])
            nb = int(sx + 1 < n // 4 and csbf[sy, sx + 1]) + \
                int(sy + 1 < n // 4 and csbf[sy + 1, sx])
            cc = _CSBF + (0 if is_luma else 2) + min(nb, 1)
            enc.bit(ctx, cc, int(coded_sb))
            infer_dc = coded_sb
        if not coded_sb:
            continue
        nbp = int(sx + 1 < n // 4 and csbf[sy, sx + 1]) + \
            2 * int(sy + 1 < n // 4 and csbf[sy + 1, sx])
        first = si << 4
        top = last if si == last_sb else first + 15
        sig_positions = []
        found = False
        for s in range(top, first - 1, -1):
            px, py = pos[s]
            sig = bool(coefs[py, px])
            if s == last and si == last_sb:
                sig_positions.append(s)
                found = True
                continue
            if s == first and infer_dc and not found:
                # inferred significant (inferSbDcSigCoeffFlag)
                if not sig:
                    raise ValueError("csbf set but sub-block empty")
                sig_positions.append(s)
                continue
            enc.bit(ctx, _sig_ctx(px & (n - 1), py & (n - 1), log2_tb,
                                  is_luma, nbp, si), int(sig))
            if sig:
                sig_positions.append(s)
                found = True
        levels = [int(abs(coefs[pos[s][1], pos[s][0]]))
                  for s in sig_positions]
        signs = [int(coefs[pos[s][1], pos[s][0]] < 0)
                 for s in sig_positions]
        ctx_set = (2 if si > 0 and is_luma else 0) + \
            (1 if prev_c1 == 0 else 0)
        if not is_luma:
            ctx_set += 4
        c1 = 1
        first_g1 = -1
        for k, lv in enumerate(levels[:8]):
            g1 = int(lv > 1)
            enc.bit(ctx, _GT1 + ctx_set * 4 + min(c1, 3), g1)
            if g1:
                if first_g1 < 0:
                    first_g1 = k
                c1 = 0
            elif c1:
                c1 = min(c1 + 1, 3)
        if first_g1 >= 0:
            enc.bit(ctx, _GT2 + ctx_set, int(levels[first_g1] > 2))
        prev_c1 = c1
        for sgn in signs:
            enc.bypass(sgn)
        rice = 0
        for k, lv in enumerate(levels):
            base = (2 + (1 if k == first_g1 else 0)) if k < 8 else 1
            if lv >= base:
                _code_remaining(enc, rice, v=lv - base)
            if lv > (3 << rice):
                rice = min(rice + 1, 4)


def _dec_residual5(dec: _CabacDec, ctx: _Ctx5, log2_tb: int,
                   is_luma: bool, scan_idx: int) -> np.ndarray:
    """Decode one TB's residual_coding() into an n×n level matrix."""
    n = 1 << log2_tb
    pos, sbs = _tb_scans(log2_tb, scan_idx)
    lx = _code_last_prefix(dec, ctx, log2_tb, is_luma, _LAST_X)
    ly = _code_last_prefix(dec, ctx, log2_tb, is_luma, _LAST_Y)
    if scan_idx == 2:
        lx, ly = ly, lx
    if lx >= n or ly >= n:
        raise ValueError("last significant coefficient out of range")
    pos_of = {p: s for s, p in enumerate(pos)}
    last = pos_of[(lx, ly)]
    last_sb = last >> 4
    out = np.zeros((n, n), dtype=np.int64)
    csbf = np.zeros((n // 4, n // 4), dtype=bool)
    csbf[sbs[last_sb][1], sbs[last_sb][0]] = True
    csbf[sbs[0][1], sbs[0][0]] = True
    prev_c1 = 1
    for si in range(last_sb, -1, -1):
        sx, sy = sbs[si]
        infer_dc = False
        if si == last_sb or si == 0:
            coded_sb = True
        else:
            nb = int(sx + 1 < n // 4 and csbf[sy, sx + 1]) + \
                int(sy + 1 < n // 4 and csbf[sy + 1, sx])
            cc = _CSBF + (0 if is_luma else 2) + min(nb, 1)
            coded_sb = bool(dec.bit(ctx, cc))
            csbf[sy, sx] = coded_sb
            infer_dc = coded_sb
        if not coded_sb:
            continue
        nbp = int(sx + 1 < n // 4 and csbf[sy, sx + 1]) + \
            2 * int(sy + 1 < n // 4 and csbf[sy + 1, sx])
        first = si << 4
        top = last if si == last_sb else first + 15
        sig_positions = []
        found = False
        for s in range(top, first - 1, -1):
            px, py = pos[s]
            if s == last and si == last_sb:
                sig_positions.append(s)
                found = True
                continue
            if s == first and infer_dc and not found:
                sig_positions.append(s)
                continue
            if dec.bit(ctx, _sig_ctx(px & (n - 1), py & (n - 1),
                                     log2_tb, is_luma, nbp, si)):
                sig_positions.append(s)
                found = True
        ctx_set = (2 if si > 0 and is_luma else 0) + \
            (1 if prev_c1 == 0 else 0)
        if not is_luma:
            ctx_set += 4
        c1 = 1
        first_g1 = -1
        g1_flags = []
        for k in range(min(len(sig_positions), 8)):
            g1 = dec.bit(ctx, _GT1 + ctx_set * 4 + min(c1, 3))
            g1_flags.append(g1)
            if g1:
                if first_g1 < 0:
                    first_g1 = k
                c1 = 0
            elif c1:
                c1 = min(c1 + 1, 3)
        g2 = 0
        if first_g1 >= 0:
            g2 = dec.bit(ctx, _GT2 + ctx_set)
        prev_c1 = c1
        nsig = len(sig_positions)
        sign_word = dec.bypass_n(nsig)
        signs = [(sign_word >> (nsig - 1 - i)) & 1
                 for i in range(nsig)]
        rice = 0
        for k, s in enumerate(sig_positions):
            if k < 8:
                lv = 1 + g1_flags[k] + (g2 if k == first_g1 else 0)
                base = 2 + (1 if k == first_g1 else 0)
                coded_max = lv == base
            else:
                lv = 1
                coded_max = True
            if coded_max:
                lv += _code_remaining(dec, rice)
            if lv > (3 << rice):
                rice = min(rice + 1, 4)
            px, py = pos[s]
            out[py, px] = -lv if signs[k] else lv
    return out


# ---------------------------------------------------------------------------
# coding units, quadtree, slice codec
# ---------------------------------------------------------------------------
# Deblocking filter (§8.7.2) — vertical edges then horizontal, on the
# 8-sample luma grid (16 for chroma); the filtered picture feeds SAO
# and becomes the reference. Within a pass the filters of adjacent
# edges never overlap (3-sample reach + 4-sample reads on an 8 grid),
# so in-place application matches the spec's parallel definition.
# ---------------------------------------------------------------------------

# Rec. ITU-T H.265 Table 8-12 (8-bit): beta' indexed by Q = clip(qp),
# tC' indexed by Q = clip(qp + 2*(bS-1)) — spec-literal data, same
# provenance class as the pinned DCT matrices (also published in
# Norkin et al., "HEVC Deblocking Filter", IEEE TCSVT 2012).
_DBF_BETA = (
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 6, 7, 8, 9,
    10, 11, 12, 13, 14, 15, 16, 17, 18, 20, 22, 24, 26, 28, 30, 32,
    34, 36, 38, 40, 42, 44, 46, 48, 50, 52, 54, 56, 58, 60, 62, 64)
_DBF_TC = (
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 5, 5,
    6, 6, 7, 8, 9, 10, 11, 13, 14, 16, 18, 20, 22, 24)


def _bs_for_cells(fr, pby, pbx, qby, qbx, ref_pocs):
    """Boundary strength (§8.7.2.4) between the 4x4 cells p and q
    across a PU/TU boundary. With one reference per list, the
    spec's motion compare reduces to comparing the per-picture
    vectors of the (unique-POC) picture sets."""
    p_intra = not fr.pdir[pby, pbx]
    q_intra = not fr.pdir[qby, qbx]
    if p_intra or q_intra:
        return 2
    cu_edge = fr.cu_id[pby, pbx] != fr.cu_id[qby, qbx]
    if cu_edge and (fr.cbf[pby, pbx] or fr.cbf[qby, qbx]):
        return 1

    def motion(by, bx):
        d = int(fr.pdir[by, bx])
        out = {}
        if d & 1:
            out[ref_pocs[0]] = (int(fr.mvs[by, bx, 0, 0]),
                                int(fr.mvs[by, bx, 0, 1]))
        if d & 2:
            out[ref_pocs[1]] = (int(fr.mvs[by, bx, 1, 0]),
                                int(fr.mvs[by, bx, 1, 1]))
        return out

    mp, mq = motion(pby, pbx), motion(qby, qbx)
    if set(mp) != set(mq):
        return 1
    for poc, mv in mp.items():
        ov = mq[poc]
        if abs(mv[0] - ov[0]) >= 4 or abs(mv[1] - ov[1]) >= 4:
            return 1
    return 0


def _dbf_luma_seg(win: np.ndarray, qp: int, bs: int) -> bool:
    """Filter one 4-line luma segment in place. ``win`` is the
    (4, 8) window [p3 p2 p1 p0 | q0 q1 q2 q3] sharing memory with
    the plane. Returns whether anything changed."""
    beta = _DBF_BETA[min(max(qp, 0), 51)]
    tc = _DBF_TC[min(max(qp + 2 * (bs - 1), 0), 53)]
    if beta == 0:
        return False
    p0, p1, p2, p3 = (win[:, 3], win[:, 2], win[:, 1], win[:, 0])
    q0, q1, q2, q3 = (win[:, 4], win[:, 5], win[:, 6], win[:, 7])
    dp_l = np.abs(p2 - 2 * p1 + p0)
    dq_l = np.abs(q2 - 2 * q1 + q0)
    dpq0 = int(dp_l[0] + dq_l[0])
    dpq3 = int(dp_l[3] + dq_l[3])
    if dpq0 + dpq3 >= beta:
        return False
    dp = int(dp_l[0] + dp_l[3])
    dq = int(dq_l[0] + dq_l[3])

    def strong_line(k):
        return (2 * (dp_l[k] + dq_l[k]) < (beta >> 2)
                and abs(int(p3[k]) - int(p0[k]))
                + abs(int(q0[k]) - int(q3[k])) < (beta >> 3)
                and abs(int(p0[k]) - int(q0[k]))
                < ((5 * tc + 1) >> 1))

    if strong_line(0) and strong_line(3):
        o = win.copy()
        P0, P1, P2, P3 = (o[:, 3], o[:, 2], o[:, 1], o[:, 0])
        Q0, Q1, Q2, Q3 = (o[:, 4], o[:, 5], o[:, 6], o[:, 7])
        c = 2 * tc
        win[:, 3] = np.clip((P2 + 2 * P1 + 2 * P0 + 2 * Q0 + Q1 + 4)
                            >> 3, P0 - c, P0 + c)
        win[:, 2] = np.clip((P2 + P1 + P0 + Q0 + 2) >> 2,
                            P1 - c, P1 + c)
        win[:, 1] = np.clip((2 * P3 + 3 * P2 + P1 + P0 + Q0 + 4)
                            >> 3, P2 - c, P2 + c)
        win[:, 4] = np.clip((Q2 + 2 * Q1 + 2 * Q0 + 2 * P0 + P1 + 4)
                            >> 3, Q0 - c, Q0 + c)
        win[:, 5] = np.clip((Q2 + Q1 + Q0 + P0 + 2) >> 2,
                            Q1 - c, Q1 + c)
        win[:, 6] = np.clip((2 * Q3 + 3 * Q2 + Q1 + Q0 + P0 + 4)
                            >> 3, Q2 - c, Q2 + c)
        return True
    if tc == 0:
        return False
    delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
    act = np.abs(delta) < 10 * tc
    dlt = np.clip(delta, -tc, tc)
    o_p0, o_p1, o_p2 = p0.copy(), p1.copy(), p2.copy()
    o_q0, o_q1, o_q2 = q0.copy(), q1.copy(), q2.copy()
    win[:, 3] = np.where(act, np.clip(o_p0 + dlt, 0, 255), o_p0)
    win[:, 4] = np.where(act, np.clip(o_q0 - dlt, 0, 255), o_q0)
    half = tc >> 1
    if dp < ((beta + (beta >> 1)) >> 3):
        dp1 = np.clip((((o_p2 + o_p0 + 1) >> 1) - o_p1 + dlt) >> 1,
                      -half, half)
        win[:, 2] = np.where(act, np.clip(o_p1 + dp1, 0, 255), o_p1)
    if dq < ((beta + (beta >> 1)) >> 3):
        dq1 = np.clip((((o_q2 + o_q0 + 1) >> 1) - o_q1 - dlt) >> 1,
                      -half, half)
        win[:, 5] = np.where(act, np.clip(o_q1 + dq1, 0, 255), o_q1)
    return True


def _dbf_chroma_seg(win: np.ndarray, qpc: int) -> None:
    """Filter one chroma segment in place (bS 2 only): ``win`` is
    (rows, 4) = [p1 p0 | q0 q1]."""
    tc = _DBF_TC[min(max(qpc + 2, 0), 53)]
    if tc == 0:
        return
    p1, p0, q0, q1 = win[:, 0], win[:, 1], win[:, 2], win[:, 3]
    dlt = np.clip((((q0 - p0) << 2) + p1 - q1 + 4) >> 3, -tc, tc)
    o_p0, o_q0 = p0.copy(), q0.copy()
    win[:, 1] = np.clip(o_p0 + dlt, 0, 255)
    win[:, 2] = np.clip(o_q0 - dlt, 0, 255)


def _deblock(fr, qp: int, ref_pocs=(None, None)) -> None:
    """Whole-picture deblocking: luma + chroma, vertical pass then
    horizontal pass (the horizontal decisions read vertically
    filtered samples, §8.7.2)."""
    qpc = _chroma_qp(qp)
    H, W = fr.Y.shape
    for vertical in (True, False):
        length = H if vertical else W
        span = W if vertical else H
        for e in range(8, span, 8):
            eb = e // 4
            for s0 in range(0, length, 4):
                sb = s0 // 4
                if vertical:
                    pby, pbx, qby, qbx = sb, eb - 1, sb, eb
                else:
                    pby, pbx, qby, qbx = eb - 1, sb, eb, sb
                if fr.pu_id[pby, pbx] == fr.pu_id[qby, qbx]:
                    continue                      # not a PU/TU edge
                bs = _bs_for_cells(fr, pby, pbx, qby, qbx, ref_pocs)
                if bs == 0:
                    continue
                if vertical:
                    win = fr.Y[s0:s0 + 4, e - 4:e + 4]
                else:
                    win = fr.Y[e - 4:e + 4, s0:s0 + 4].T
                _dbf_luma_seg(win, qp, bs)
                if bs == 2 and e % 16 == 0:
                    ce, cs = e // 2, s0 // 2
                    for plane in (fr.Cb, fr.Cr):
                        if vertical:
                            cw = plane[cs:cs + 2, ce - 2:ce + 2]
                        else:
                            cw = plane[ce - 2:ce + 2, cs:cs + 2].T
                        _dbf_chroma_seg(cw, qpc)


# ---------------------------------------------------------------------------
# SAO — sample-adaptive offset (§7.3.8.3 syntax, §8.7.3 filtering)
# ---------------------------------------------------------------------------

# edge-offset class -> the two neighbour (dy, dx) offsets
_SAO_EO_NB = {0: ((0, -1), (0, 1)),      # horizontal
              1: ((-1, 0), (1, 0)),      # vertical
              2: ((-1, -1), (1, 1)),     # 135 degrees
              3: ((1, -1), (-1, 1))}     # 45 degrees


def _code_sao_type(x, ctx, v=None) -> int:
    """sao_type_idx_luma/chroma: TR cMax 2, bin0 context-coded,
    bin1 bypass ("0" off, "10" band, "11" edge)."""
    if v is not None:
        x.bit(ctx, _SAO_TYPE, 1 if v else 0)
        if v:
            x.bypass(1 if v == 2 else 0)
        return v
    if not x.bit(ctx, _SAO_TYPE):
        return 0
    return 2 if x.bypass() else 1


def _code_sao_abs(x, v=None) -> int:
    """sao_offset_abs: TR cMax 7 (8-bit), all bypass."""
    if v is not None:
        for _ in range(v):
            x.bypass(1)
        if v < 7:
            x.bypass(0)
        return v
    v = 0
    while v < 7 and x.bypass():
        v += 1
    return v


def _ser_sao_comp(enc, ctx, cidx: int, p):
    """Serialize one component's sao() body after the merge flags:
    type (luma codes its own, chroma once at cIdx 1, cIdx 2
    inherits), four offset magnitudes, then band signs + position or
    the EO class. ``p`` is None (off) | ("bo", pos, offs) |
    ("eo", cls, offs) with offs the four SIGNED applied offsets
    (EO signs are inferred by the spec: the first two non-negative,
    the last two non-positive)."""
    typ = 0 if p is None else (1 if p[0] == "bo" else 2)
    if cidx != 2:
        _code_sao_type(enc, ctx, v=typ)
    if typ == 0:
        return
    offs = p[2]
    for o in offs:
        _code_sao_abs(enc, v=abs(o))
    if typ == 1:
        for o in offs:
            if o:
                enc.bypass(1 if o < 0 else 0)
        for i in range(4, -1, -1):
            enc.bypass((p[1] >> i) & 1)
    elif cidx != 2:
        enc.bypass((p[1] >> 1) & 1)
        enc.bypass(p[1] & 1)


def _dec_sao_comp(dec, ctx, cidx: int, inherit_typ, inherit_cls):
    """Decode twin of :func:`_ser_sao_comp`; returns
    (params, typ, eo_cls) so cIdx 2 can inherit chroma's type and
    class while decoding its own offsets."""
    typ = _code_sao_type(dec, ctx) if cidx != 2 else inherit_typ
    if typ == 0:
        return None, typ, inherit_cls
    absv = [_code_sao_abs(dec) for _ in range(4)]
    if typ == 1:
        offs = []
        for a in absv:
            if a and dec.bypass():
                offs.append(-a)
            else:
                offs.append(a)
        pos = 0
        for _ in range(5):
            pos = (pos << 1) | dec.bypass()
        return ("bo", pos, tuple(offs)), typ, inherit_cls
    if cidx != 2:
        cls = (dec.bypass() << 1) | dec.bypass()
    else:
        cls = inherit_cls
    offs = (absv[0], absv[1], -absv[2], -absv[3])
    return ("eo", cls, offs), typ, cls


def _dec_sao(dec, ctx, cx: int, cy: int, all_params: dict,
             sh: dict):
    """sao() for one CTB: merge-left/up flags then per-component
    params."""
    if cx > 0 and dec.bit(ctx, _SAO_MERGE):
        return all_params[(cx - 1, cy)]
    if cy > 0 and dec.bit(ctx, _SAO_MERGE):
        return all_params[(cx, cy - 1)]
    out = []
    typ = cls = 0
    for cidx in range(3):
        if (cidx == 0 and not sh["sao_luma"]) or \
                (cidx > 0 and not sh["sao_chroma"]):
            out.append(None)
            continue
        p, typ, cls = _dec_sao_comp(dec, ctx, cidx, typ, cls)
        out.append(p)
    return tuple(out)


def _ser_sao(enc, ctx, cx: int, cy: int, params, all_params: dict,
             sh: dict):
    """Encoder twin of :func:`_dec_sao` — merges with the left/up
    CTB when the chosen params are identical (exercising the merge
    syntax naturally on uniform content)."""
    if cx > 0:
        left = all_params[(cx - 1, cy)]
        enc.bit(ctx, _SAO_MERGE, 1 if params == left else 0)
        if params == left:
            return
    if cy > 0:
        up = all_params[(cx, cy - 1)]
        enc.bit(ctx, _SAO_MERGE, 1 if params == up else 0)
        if params == up:
            return
    for cidx in range(3):
        if (cidx == 0 and not sh["sao_luma"]) or \
                (cidx > 0 and not sh["sao_chroma"]):
            continue
        _ser_sao_comp(enc, ctx, cidx, params[cidx])


def _sao_apply_region(dst: np.ndarray, src: np.ndarray, x0: int,
                      y0: int, n: int, p):
    """Apply one CTB-component's SAO params: classify on the pre-SAO
    plane ``src``, write into ``dst`` (§8.7.3: SAO reads the
    unfiltered reconstruction everywhere, including across CTB
    boundaries)."""
    if p is None:
        return
    H, W = src.shape
    n_y = min(n, H - y0)
    n_x = min(n, W - x0)
    if n_y <= 0 or n_x <= 0:
        return
    blk = src[y0:y0 + n_y, x0:x0 + n_x]
    if p[0] == "bo":
        pos, offs = p[1], p[2]
        band = blk >> 3
        delta = np.zeros_like(blk)
        for k in range(4):
            delta[band == ((pos + k) & 31)] = offs[k]
        dst[y0:y0 + n_y, x0:x0 + n_x] = np.clip(blk + delta, 0, 255)
        return
    cls, offs = p[1], p[2]
    (ay, ax), (by, bx) = _SAO_EO_NB[cls]
    ys = np.arange(y0, y0 + n_y)
    xs = np.arange(x0, x0 + n_x)
    # picture-boundary pixels whose neighbour falls outside stay
    # unmodified (the spec skips them)
    ok_y = (ys + ay >= 0) & (ys + ay < H) & (ys + by >= 0) & \
        (ys + by < H)
    ok_x = (xs + ax >= 0) & (xs + ax < W) & (xs + bx >= 0) & \
        (xs + bx < W)
    na = src[np.ix_(np.clip(ys + ay, 0, H - 1),
                    np.clip(xs + ax, 0, W - 1))]
    nb = src[np.ix_(np.clip(ys + by, 0, H - 1),
                    np.clip(xs + bx, 0, W - 1))]
    edge = 2 + np.sign(blk - na) + np.sign(blk - nb)
    lut = np.array([offs[0], offs[1], 0, offs[2], offs[3]],
                   dtype=np.int64)
    delta = lut[edge.astype(np.int64)]
    delta[~np.outer(ok_y, ok_x)] = 0
    dst[y0:y0 + n_y, x0:x0 + n_x] = np.clip(blk + delta, 0, 255)


def _apply_sao(fr, all_params: dict, ctbs_w: int, ctbs_h: int):
    """Frame-level SAO pass: classification reads the pre-SAO recon
    of every plane; the filtered planes replace the frame's (they
    are both the output and the reference for later pictures)."""
    srcY = fr.Y.copy()
    srcCb = fr.Cb.copy()
    srcCr = fr.Cr.copy()
    for cy in range(ctbs_h):
        for cx in range(ctbs_w):
            p = all_params[(cx, cy)]
            _sao_apply_region(fr.Y, srcY, cx * 16, cy * 16, 16, p[0])
            _sao_apply_region(fr.Cb, srcCb, cx * 8, cy * 8, 8, p[1])
            _sao_apply_region(fr.Cr, srcCr, cx * 8, cy * 8, 8, p[2])


def _sao_choose_comp(src: np.ndarray, rec: np.ndarray, x0: int,
                     y0: int, n: int):
    """Deterministic encoder-side SAO decision for one
    CTB-component: evaluate off / band offset / the four EO classes
    by exact integer SSE delta and pick the strict best (ties keep
    off). EO classification is restricted to pixels whose
    neighbours lie inside the CTB — the full-frame recon is not
    final until the frame completes, and any parameter choice is
    conformant; this only affects optimality at CTB seams."""
    H, W = src.shape
    n_y = min(n, H - y0)
    n_x = min(n, W - x0)
    if n_y <= 0 or n_x <= 0:
        return None
    s = src[y0:y0 + n_y, x0:x0 + n_x].astype(np.int64)
    r = rec[y0:y0 + n_y, x0:x0 + n_x].astype(np.int64)
    diff = s - r
    best_d, best = 0, None

    def offset_for(ssum, cnt, lo, hi):
        if cnt == 0:
            return 0
        o = int(np.round(ssum / cnt))
        return min(max(o, lo), hi)

    # band offset: per-band ideal offsets, best 4-band window
    band = r >> 3
    sums = np.zeros(32, dtype=np.int64)
    cnts = np.zeros(32, dtype=np.int64)
    np.add.at(sums, band.ravel(), diff.ravel())
    np.add.at(cnts, band.ravel(), 1)
    obs = [offset_for(int(sums[b]), int(cnts[b]), -7, 7)
           for b in range(32)]
    deltas = [obs[b] * obs[b] * int(cnts[b]) - 2 * obs[b] * int(sums[b])
              for b in range(32)]
    for pos in range(32):
        bands = [(pos + k) & 31 for k in range(4)]
        d = sum(deltas[b] for b in bands)
        offs = tuple(obs[b] for b in bands)
        if any(offs) and d < best_d:
            best_d, best = d, ("bo", pos, offs)
    # edge offset classes
    for cls in range(4):
        (ay, ax), (by, bx) = _SAO_EO_NB[cls]
        y_lo = max(0, -min(ay, by))
        y_hi = n_y - max(0, max(ay, by))
        x_lo = max(0, -min(ax, bx))
        x_hi = n_x - max(0, max(ax, bx))
        if y_hi - y_lo <= 0 or x_hi - x_lo <= 0:
            continue
        c = r[y_lo:y_hi, x_lo:x_hi]
        na = r[y_lo + ay:y_hi + ay, x_lo + ax:x_hi + ax]
        nb = r[y_lo + by:y_hi + by, x_lo + bx:x_hi + bx]
        edge = 2 + np.sign(c - na) + np.sign(c - nb)
        dd = diff[y_lo:y_hi, x_lo:x_hi]
        offs = []
        d_tot = 0
        for k, (lo, hi) in zip((0, 1, 3, 4),
                               ((0, 7), (0, 7), (-7, 0), (-7, 0))):
            m = edge == k
            cnt = int(m.sum())
            ssum = int(dd[m].sum())
            o = offset_for(ssum, cnt, lo, hi)
            offs.append(o)
            d_tot += o * o * cnt - 2 * o * ssum
        if any(offs) and d_tot < best_d:
            best_d, best = d_tot, ("eo", cls, tuple(offs))
    return best


# ---------------------------------------------------------------------------


class _Frame5:
    """Per-frame decode/encode state: recon planes plus the
    4x4-luma-granular availability / intra-mode / CU-depth grids the
    context and prediction derivations need. P/B slices (r8) add
    the 4x4-granular motion field: ``mvs`` (quarter-luma-pel
    vectors, indexed [y, x, list, comp]), ``pdir`` (0 = intra/none,
    1 = L0, 2 = L1, 3 = bi), and ``skip`` (cu_skip_flag of the
    covering CU, for the skip context)."""

    __slots__ = ("Y", "Cb", "Cr", "avail", "modes", "depths",
                 "mvs", "pdir", "skip", "W", "H", "poc",
                 "cu_id", "pu_id", "cbf", "next_id")

    def __init__(self, W: int, H: int):
        self.W, self.H = W, H
        self.poc = 0
        self.Y = np.zeros((H, W), dtype=np.int64)
        self.Cb = np.full((H // 2, W // 2), 128, dtype=np.int64)
        self.Cr = np.full((H // 2, W // 2), 128, dtype=np.int64)
        self.avail = np.zeros((H // 4, W // 4), dtype=bool)
        self.modes = np.full((H // 4, W // 4), -1, dtype=np.int16)
        self.depths = np.zeros((H // 4, W // 4), dtype=np.int8)
        self.mvs = np.zeros((H // 4, W // 4, 2, 2), dtype=np.int32)
        self.pdir = np.zeros((H // 4, W // 4), dtype=np.uint8)
        self.skip = np.zeros((H // 4, W // 4), dtype=bool)
        # deblocking metadata (late r8): CU / PU identity per 4x4
        # cell (boundary detection on the 8-sample grid) and the
        # luma coded-residual flag of the covering TU
        self.cu_id = np.full((H // 4, W // 4), -1, dtype=np.int32)
        self.pu_id = np.full((H // 4, W // 4), -1, dtype=np.int32)
        self.cbf = np.zeros((H // 4, W // 4), dtype=bool)
        self.next_id = 0

    def new_id(self) -> int:
        self.next_id += 1
        return self.next_id - 1

    def mark_ids(self, x0: int, y0: int, w: int, h: int,
                 cu: int, pu: int, cbf=None):
        bx, by = x0 // 4, y0 // 4
        bw_, bh_ = w // 4, h // 4
        self.cu_id[by:by + bh_, bx:bx + bw_] = cu
        self.pu_id[by:by + bh_, bx:bx + bw_] = pu
        if cbf is not None:
            self.cbf[by:by + bh_, bx:bx + bw_] = cbf


def _split_ctx(fr: _Frame5, x0: int, y0: int, depth: int) -> int:
    """split_cu_flag ctxInc (§9.3.4.2.2): + (left CU deeper) +
    (above CU deeper), unavailable neighbours count 0."""
    bx, by = x0 // 4, y0 // 4
    inc = 0
    if x0 > 0 and fr.avail[by, bx - 1] and fr.depths[by, bx - 1] > depth:
        inc += 1
    if y0 > 0 and fr.avail[by - 1, bx] and fr.depths[by - 1, bx] > depth:
        inc += 1
    return _SPLIT_CU + inc


def _code_luma_mode(x, ctx, mpm: list, mode=None):
    """prev_intra_luma_pred_flag is coded by the CALLER (the spec
    batches the four NxN flags before the index/rem loop); this
    codes the second part: mpm_idx (TR, bypass) or
    rem_intra_luma_pred_mode (5-bit FL, bypass)."""
    if mode is not None:
        if mode in mpm:
            idx = mpm.index(mode)
            x.bypass(1 if idx else 0)
            if idx:
                x.bypass(idx - 1)
        else:
            rem = mode - sum(1 for c in sorted(mpm) if c < mode)
            for i in range(4, -1, -1):
                x.bypass((rem >> i) & 1)
        return mode
    raise AssertionError("decoder path uses _dec_luma_mode")


def _dec_luma_mode(dec, mpm: list, prev: int) -> int:
    if prev:
        idx = dec.bypass()
        if idx:
            idx += dec.bypass()
        return mpm[idx]
    rem = 0
    for _ in range(5):
        rem = (rem << 1) | dec.bypass()
    for c in sorted(mpm):
        if rem >= c:
            rem += 1
    if rem > 34:
        raise ValueError("rem_intra_luma_pred_mode out of range")
    return rem


_CHROMA_CANDS = [0, 26, 10, 1]


def _chroma_mode_from_idx(idx: int, luma_mode: int) -> int:
    if idx == 4:
        return luma_mode                      # DM
    c = _CHROMA_CANDS[idx]
    return 34 if c == luma_mode else c


def _predict_tb(fr: _Frame5, plane: np.ndarray, x0: int, y0: int,
                n: int, mode: int, is_luma: bool) -> np.ndarray:
    g = 4 if is_luma else 2
    left, top = _gather_refs(plane, fr.avail, x0, y0, n, g=g)
    if _use_filter(mode, n, is_luma):
        left, top = _filter_refs(left, top)
    return _pred_intra(left, top, mode, n, is_luma)


def _recon_tb(pred: np.ndarray, levels, qp: int, log2_tb: int,
              is_luma: bool, bypass: bool,
              intra: bool = True) -> np.ndarray:
    """pred + inverse-scaled residual, clipped to 8-bit. ``intra``
    picks DST-VII for 4x4 luma (§8.6.4.2 applies it to intra only —
    inter residuals always use DCT-II)."""
    if levels is None:
        return np.clip(pred, 0, 255)
    if bypass:
        res = levels
    else:
        d = _dequant(levels, qp, log2_tb)
        res = _inv_transform(d, _tb_matrix(1 << log2_tb, is_luma, intra))
    return np.clip(pred + res, 0, 255)


def _mark(fr: _Frame5, x0: int, y0: int, size: int, depth: int,
          mode: int = -1):
    bs = size // 4
    bx, by = x0 // 4, y0 // 4
    fr.avail[by:by + bs, bx:bx + bs] = True
    fr.depths[by:by + bs, bx:bx + bs] = depth
    if mode >= 0:
        fr.modes[by:by + bs, bx:bx + bs] = mode


# ---------------------------------------------------------------------------
# inter prediction — P slices (r8)
# ---------------------------------------------------------------------------

# §8.5.4.2.2.1 Table 8-12: 8-tap DCT-IF luma filters (quarter-pel)
_LUMA_FILT = {
    1: (-1, 4, -10, 58, 17, -5, 1, 0),
    2: (-1, 4, -11, 40, 40, -11, 4, -1),
    3: (0, 1, -5, 17, 58, -10, 4, -1),
}
# §8.5.4.2.2.2 Table 8-13: 4-tap chroma filters (eighth-pel)
_CHROMA_FILT = {
    1: (-2, 58, 10, -2),
    2: (-4, 54, 16, -2),
    3: (-6, 46, 28, -4),
    4: (-4, 36, 36, -4),
    5: (-4, 28, 46, -6),
    6: (-2, 16, 54, -4),
    7: (-2, 10, 58, -2),
}

_FILT_VECS: dict = {}


def _win1(a: np.ndarray, n: int, axis: int) -> np.ndarray:
    """Length-``n`` sliding windows of 2-D ``a`` along ``axis`` as a
    read-only strided view (sliding_window_view without its ~30 µs of
    per-call Python argument normalization — these run in the motion
    search inner loop)."""
    s0, s1 = a.strides
    if axis:
        return np.lib.stride_tricks.as_strided(
            a, (a.shape[0], a.shape[1] - n + 1, n), (s0, s1, s1),
            writeable=False)
    return np.lib.stride_tricks.as_strided(
        a, (a.shape[0] - n + 1, a.shape[1], n), (s0, s1, s0),
        writeable=False)


def _win2(a: np.ndarray, h: int, w: int) -> np.ndarray:
    """All (h, w) sliding windows of 2-D ``a`` as a strided view of
    shape (rows-h+1, cols-w+1, h, w)."""
    s0, s1 = a.strides
    return np.lib.stride_tricks.as_strided(
        a, (a.shape[0] - h + 1, a.shape[1] - w + 1, h, w),
        (s0, s1, s0, s1), writeable=False)


def _filt_vec(filt: dict, frac: int) -> np.ndarray:
    """Filter taps as a cached int64 vector for the matmul form of
    _mc_plane (keyed by table identity + fraction)."""
    key = (id(filt), frac)
    v = _FILT_VECS.get(key)
    if v is None:
        v = np.array(filt[frac], dtype=np.int64)
        _FILT_VECS[key] = v
    return v


def _mc_plane(ref: np.ndarray, x0: int, y0: int, w: int, h: int,
              mvx: int, mvy: int, taps: int, filt: dict,
              frac_bits: int, finalize: bool = True) -> np.ndarray:
    """Fractional-sample motion compensation for one plane
    (§8.5.4.2.2): separable DCT-IF, horizontal then vertical, with
    the 8-bit shift chain shift1=0 / shift2=6 / shift3=6 and the
    uni-prediction finalization (+32) >> 6 of §8.5.4.2.3.2 (or the
    raw 14-bit plane when ``finalize`` is False — the bi-prediction
    combiner needs both lists unfinalized, §8.5.4.2.3.2's
    (L0 + L1 + 64) >> 7 chain). Out-of-picture positions clamp to
    the frame edge (the spec's coordinate Clip3). ``frac_bits`` is
    2 for luma quarter-pel MVs, 3 for chroma (luma MV reused at
    eighth-chroma-pel precision).

    The full-pel fast path (ref << 6, +32 >> 6) is an exact copy; the
    mixed-fraction chains are exact too: the pre-shifted << 6
    intermediate is a multiple of 64, so the later >> 6 loses no
    bits (matching the spec's unshifted single-stage forms)."""
    H, W = ref.shape
    ix = x0 + (mvx >> frac_bits)
    iy = y0 + (mvy >> frac_bits)
    fx = mvx & ((1 << frac_bits) - 1)
    fy = mvy & ((1 << frac_bits) - 1)
    if not fx and not fy:
        xs = np.arange(ix, ix + w).clip(0, W - 1)
        ys = np.arange(iy, iy + h).clip(0, H - 1)
        p14 = ref[ys[:, None], xs].astype(np.int64) << 6
    else:
        lo = taps // 2 - 1                       # taps at -lo .. +lo+1
        hi = taps - lo
        xs = np.arange(ix - lo, ix + w + hi - 1).clip(0, W - 1)
        ys = np.arange(iy - lo, iy + h + hi - 1).clip(0, H - 1)
        win = np.ascontiguousarray(
            ref[ys[:, None], xs].astype(np.int64))
        # tap application as one integer matmul over a sliding view —
        # integer addition is associative and exact, so any summation
        # order matches the spec's left-to-right sum bit for bit
        if fx:
            hbuf = _win1(win, taps, 1) @ _filt_vec(filt, fx)
        else:
            hbuf = win[:, lo:lo + w] << 6
        if fy:
            p14 = (_win1(np.ascontiguousarray(hbuf), taps, 0)
                   @ _filt_vec(filt, fy)) >> 6
        else:
            p14 = hbuf[lo:lo + h, :]
    if not finalize:
        return p14
    return ((p14 + 32) >> 6).clip(0, 255)


def _mc_luma(ref: np.ndarray, x0, y0, w, h, mv,
             finalize: bool = True) -> np.ndarray:
    return _mc_plane(ref, x0, y0, w, h, int(mv[0]), int(mv[1]),
                     8, _LUMA_FILT, 2, finalize)


def _mc_chroma(ref: np.ndarray, cx0, cy0, w, h, mv,
               finalize: bool = True) -> np.ndarray:
    return _mc_plane(ref, cx0, cy0, w, h, int(mv[0]), int(mv[1]),
                     4, _CHROMA_FILT, 3, finalize)


def _mot_at(fr: _Frame5, bx: int, by: int):
    """Motion record (dir, mvL0, mvL1) of the 4x4 cell (bx, by), or
    None when the cell is outside the picture, not yet decoded, or
    intra-coded."""
    if bx < 0 or by < 0 or bx >= fr.W // 4 or by >= fr.H // 4:
        return None
    if not fr.avail[by, bx] or not fr.pdir[by, bx]:
        return None
    return (int(fr.pdir[by, bx]),
            (int(fr.mvs[by, bx, 0, 0]), int(fr.mvs[by, bx, 0, 1])),
            (int(fr.mvs[by, bx, 1, 0]), int(fr.mvs[by, bx, 1, 1])))


def _merge_candidates(fr: _Frame5, x0: int, y0: int, nw: int, nh: int,
                      max_cand: int, no_a1: bool = False,
                      no_b1: bool = False,
                      slice_type: int = 1) -> list:
    """§8.5.3.2.3 spatial merge list (single L0 reference, no TMVP —
    sps_temporal_mvp_enabled_flag is 0 in our SPS): A1 B1 B0 A0 (B2
    when fewer than 4), spec pruning pairs, zero-MV fill. With one
    reference picture the spec's full motion compare reduces to an
    MV compare. ``no_a1``/``no_b1`` implement the second-PU
    exclusions of a vertical/horizontal split (the excluded position
    lies in the sibling PU — merging with it would replicate
    2Nx2N). B slices (``slice_type`` 0) append the §8.5.3.2.4
    combined bi-predictive candidates before the zero fill, whose
    direction is bi for B and L0 for P. Candidates are full motion
    records (dir, mvL0, mvL1)."""
    bx0, by0 = x0 // 4, y0 // 4
    bw_, bh_ = nw // 4, nh // 4
    a1 = None if no_a1 else _mot_at(fr, bx0 - 1, by0 + bh_ - 1)
    b1 = None if no_b1 else _mot_at(fr, bx0 + bw_ - 1, by0 - 1)
    b0 = _mot_at(fr, bx0 + bw_, by0 - 1)
    a0 = _mot_at(fr, bx0 - 1, by0 + bh_)
    b2 = _mot_at(fr, bx0 - 1, by0 - 1)
    cands = []
    if a1 is not None:
        cands.append(a1)
    if b1 is not None and b1 != a1:
        cands.append(b1)
    if b0 is not None and b0 != b1:
        cands.append(b0)
    if a0 is not None and a0 != a1:
        cands.append(a0)
    if len(cands) < 4 and b2 is not None and b2 != a1 and b2 != b1:
        cands.append(b2)
    if slice_type == 0 and len(cands) > 1:
        # combined bi-predictive candidates: L0 of cand i + L1 of
        # cand j over the spec's fixed index pair order
        n0 = len(cands)
        for i, j in ((0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1),
                     (0, 3), (3, 0), (1, 3), (3, 1), (2, 3), (3, 2)):
            if len(cands) >= max_cand:
                break
            if i >= n0 or j >= n0:
                continue
            ca, cb = cands[i], cands[j]
            if not (ca[0] & 1) or not (cb[0] & 2):
                continue
            comb = (3, ca[1], cb[2])
            if comb != ca and comb != cb:
                cands.append(comb)
    zero_dir = 3 if slice_type == 0 else 1
    while len(cands) < max_cand:
        cands.append((zero_dir, (0, 0), (0, 0)))
    cands = cands[:max_cand]
    if nw + nh == 12:
        # §8.5.3.2.2: 8x4/4x8 PUs cannot bi-predict — bi candidates
        # convert to L0-only (predFlagL1 = 0) on the final list
        cands = [(1, c[1], (0, 0)) if c[0] == 3 else c
                 for c in cands]
    return cands


def _c_div(a: int, b: int) -> int:
    """C-style integer division (truncation toward zero)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _mv_scale(mv, tb: int, td: int):
    """§8.5.3.2.8 POC-distance motion scaling."""
    if tb == td:
        return mv
    tx = _c_div(16384 + (abs(td) >> 1), td)
    dsf = min(max((tb * tx + 32) >> 6, -4096), 4095)
    out = []
    for c in mv:
        v = dsf * c
        v = (abs(v) + 127) >> 8
        if dsf * c < 0:
            v = -v
        out.append(min(max(v, -32768), 32767))
    return (out[0], out[1])


def _amvp_candidates(fr: _Frame5, x0: int, y0: int, nw: int, nh: int,
                     lst: int = 0, poc: int = 0,
                     ref_pocs=(None, None)) -> list:
    """§8.5.3.2.5-7 AMVP for list ``lst``: first available of
    {A0, A1}, first available of {B0, B1, B2} (pruned against A),
    zero fill to 2. A neighbour holding the target list contributes
    directly (one reference per list — same picture by
    construction); a neighbour holding only the other list
    contributes its vector scaled by the §8.5.3.2.8 POC-distance
    formula (identity in P slices, where there is no other list)."""

    def from_mot(mot):
        if mot is None:
            return None
        d = mot[0]
        if d & (1 << lst):
            return mot[1 + lst]
        oth = 1 - lst
        if d & (1 << oth) and ref_pocs[oth] is not None:
            return _mv_scale(mot[1 + oth], poc - ref_pocs[lst],
                             poc - ref_pocs[oth])
        return None

    bx0, by0 = x0 // 4, y0 // 4
    bw_, bh_ = nw // 4, nh // 4
    a = from_mot(_mot_at(fr, bx0 - 1, by0 + bh_))          # A0
    if a is None:
        a = from_mot(_mot_at(fr, bx0 - 1, by0 + bh_ - 1))  # A1
    b = from_mot(_mot_at(fr, bx0 + bw_, by0 - 1))          # B0
    if b is None:
        b = from_mot(_mot_at(fr, bx0 + bw_ - 1, by0 - 1))  # B1
    if b is None:
        b = from_mot(_mot_at(fr, bx0 - 1, by0 - 1))        # B2
    out = []
    if a is not None:
        out.append(a)
    if b is not None and b != a:
        out.append(b)
    while len(out) < 2:
        out.append((0, 0))
    return out[:2]


def _skip_ctx(fr: _Frame5, x0: int, y0: int) -> int:
    """cu_skip_flag ctxInc (§9.3.4.2.2): + left skip + above skip."""
    bx, by = x0 // 4, y0 // 4
    inc = 0
    if x0 > 0 and fr.avail[by, bx - 1] and fr.skip[by, bx - 1]:
        inc += 1
    if y0 > 0 and fr.avail[by - 1, bx] and fr.skip[by - 1, bx]:
        inc += 1
    return _CU_SKIP + inc


def _code_merge_idx(x, ctx, max_merge: int, v=None) -> int:
    """merge_idx: TR, cMax = MaxNumMergeCand - 1; bin 0 context-coded,
    the rest bypass (§9.3.3.2, Table 9-32)."""
    cmax = max_merge - 1
    if cmax == 0:
        return 0
    if v is not None:
        x.bit(ctx, _MERGE_IDX, 1 if v > 0 else 0)
        for i in range(1, v):
            x.bypass(1)
        if 0 < v < cmax:
            x.bypass(0)
        return v
    if not x.bit(ctx, _MERGE_IDX):
        return 0
    v = 1
    while v < cmax and x.bypass():
        v += 1
    return v


def _code_mvd_pair(x, ctx, mv=None):
    """mvd_coding(x0, y0, 0) (§7.3.8.9): abs_mvd_greater0_flag for
    both components, abs_mvd_greater1_flag for both (where coded),
    then per-component abs_mvd_minus2 (EG1, bypass) + sign."""
    if mv is not None:
        ax, ay = abs(mv[0]), abs(mv[1])
        x.bit(ctx, _MVD_GR0, 1 if ax else 0)
        x.bit(ctx, _MVD_GR0, 1 if ay else 0)
        if ax:
            x.bit(ctx, _MVD_GR1, 1 if ax > 1 else 0)
        if ay:
            x.bit(ctx, _MVD_GR1, 1 if ay > 1 else 0)
        for a, v in ((ax, mv[0]), (ay, mv[1])):
            if a:
                if a > 1:
                    _eg_bypass(x, 1, a - 2)
                x.bypass(1 if v < 0 else 0)
        return mv
    g0x = x.bit(ctx, _MVD_GR0)
    g0y = x.bit(ctx, _MVD_GR0)
    g1x = x.bit(ctx, _MVD_GR1) if g0x else 0
    g1y = x.bit(ctx, _MVD_GR1) if g0y else 0
    out = []
    for g0, g1 in ((g0x, g1x), (g0y, g1y)):
        if not g0:
            out.append(0)
            continue
        a = (_eg_bypass(x, 1) + 2) if g1 else 1
        out.append(-a if x.bypass() else a)
    return tuple(out)


def _eg_bypass(x, k: int, v=None) -> int:
    """Exp-Golomb order-k bypass bins (§9.3.3.5, EGk)."""
    if v is not None:
        while v >= (1 << k):
            x.bypass(1)
            v -= 1 << k
            k += 1
        x.bypass(0)
        for i in range(k - 1, -1, -1):
            x.bypass((v >> i) & 1)
        return v
    v = 0
    while x.bypass():
        v += 1 << k
        k += 1
        if k > 30:
            raise ValueError("exp-Golomb bypass overflow")
    suf = 0
    for _ in range(k):
        suf = (suf << 1) | x.bypass()
    return v + suf


def _mark_inter(fr: _Frame5, x0: int, y0: int, nw: int, nh: int,
                depth: int, mot, skip: bool):
    bw_, bh_ = nw // 4, nh // 4
    bx, by = x0 // 4, y0 // 4
    fr.avail[by:by + bh_, bx:bx + bw_] = True
    fr.depths[by:by + bh_, bx:bx + bw_] = depth
    # inter cells read as INTRA_DC in intra MPM derivation (§8.4.2)
    fr.modes[by:by + bh_, bx:bx + bw_] = 1
    fr.pdir[by:by + bh_, bx:bx + bw_] = mot[0]
    fr.skip[by:by + bh_, bx:bx + bw_] = skip
    for l in (0, 1):
        fr.mvs[by:by + bh_, bx:bx + bw_, l, 0] = mot[1 + l][0]
        fr.mvs[by:by + bh_, bx:bx + bw_, l, 1] = mot[1 + l][1]


def _pu_geometry(part: str, x0: int, y0: int, n: int) -> list:
    """(px, py, pw, ph) per prediction unit for the supported inter
    part modes (the four AMP shapes split at n/4)."""
    q = n // 4
    if part == "2Nx2N":
        return [(x0, y0, n, n)]
    if part == "2NxN":
        return [(x0, y0, n, n // 2), (x0, y0 + n // 2, n, n // 2)]
    if part == "Nx2N":
        return [(x0, y0, n // 2, n), (x0 + n // 2, y0, n // 2, n)]
    if part == "2NxnU":
        return [(x0, y0, n, q), (x0, y0 + q, n, n - q)]
    if part == "2NxnD":
        return [(x0, y0, n, n - q), (x0, y0 + n - q, n, q)]
    if part == "nLx2N":
        return [(x0, y0, q, n), (x0 + q, y0, n - q, n)]
    if part == "nRx2N":
        return [(x0, y0, n - q, n), (x0 + n - q, y0, q, n)]
    raise ValueError(part)


_HORIZ_PARTS = ("2NxN", "2NxnU", "2NxnD")
_VERT_PARTS = ("Nx2N", "nLx2N", "nRx2N")


def _pu_pred(refs, px: int, py: int, pw: int, ph: int, mot):
    """One PU's (Y, Cb, Cr) prediction. ``refs`` is (refL0, refL1)
    _Frame5s; uni-prediction finalizes per §8.5.4.2.3.2's
    (p14 + 32) >> 6, bi-prediction combines the two unfinalized
    14-bit planes as (L0 + L1 + 64) >> 7."""
    d = mot[0]
    cpx, cpy, cpw, cph = px // 2, py // 2, pw // 2, ph // 2
    if d != 3:
        l = 0 if d == 1 else 1
        ref = refs[l]
        mv = mot[1 + l]
        return (_mc_luma(ref.Y, px, py, pw, ph, mv),
                _mc_chroma(ref.Cb, cpx, cpy, cpw, cph, mv),
                _mc_chroma(ref.Cr, cpx, cpy, cpw, cph, mv))
    out = []
    for plane, gx, gy, gw, gh, mc in (
            ("Y", px, py, pw, ph, _mc_luma),
            ("Cb", cpx, cpy, cpw, cph, _mc_chroma),
            ("Cr", cpx, cpy, cpw, cph, _mc_chroma)):
        p0 = mc(getattr(refs[0], plane), gx, gy, gw, gh, mot[1],
                finalize=False)
        p1 = mc(getattr(refs[1], plane), gx, gy, gw, gh, mot[2],
                finalize=False)
        out.append(np.clip((p0 + p1 + 64) >> 7, 0, 255))
    return tuple(out)


def _inter_pred_planes(refs, x0: int, y0: int, n: int,
                       pu_mvs: list):
    """Assemble the CU's motion-compensated prediction from per-PU
    motion records (quarter-luma-pel; chroma reuses the luma MV at
    eighth-chroma-pel precision, §8.5.4.2.2.2)."""
    predY = np.empty((n, n), dtype=np.int64)
    nc = n // 2
    predCb = np.empty((nc, nc), dtype=np.int64)
    predCr = np.empty((nc, nc), dtype=np.int64)
    for px, py, pw, ph, mot in pu_mvs:
        pY, pCb, pCr = _pu_pred(refs, px, py, pw, ph, mot)
        ry, rx = py - y0, px - x0
        predY[ry:ry + ph, rx:rx + pw] = pY
        cry, crx = py // 2 - y0 // 2, px // 2 - x0 // 2
        predCb[cry:cry + ph // 2, crx:crx + pw // 2] = pCb
        predCr[cry:cry + ph // 2, crx:crx + pw // 2] = pCr
    return predY, predCb, predCr


def _recon_inter_cu(fr: _Frame5, x0: int, y0: int, n: int,
                    preds, lv_y, lv_cb, lv_cr, qp: int, bypass: bool):
    predY, predCb, predCr = preds
    log2_cb = n.bit_length() - 1
    fr.Y[y0:y0 + n, x0:x0 + n] = _recon_tb(
        predY, lv_y, qp, log2_cb, True, bypass, intra=False)
    qpc = _chroma_qp(qp)
    nc = n // 2
    cx, cy = x0 // 2, y0 // 2
    fr.Cb[cy:cy + nc, cx:cx + nc] = _recon_tb(
        predCb, lv_cb, qpc, log2_cb - 1, False, bypass, intra=False)
    fr.Cr[cy:cy + nc, cx:cx + nc] = _recon_tb(
        predCr, lv_cr, qpc, log2_cb - 1, False, bypass, intra=False)


def _dec_pu_motion(dec: _CabacDec, ctx: _Ctx5, fr: _Frame5, sh: dict,
                   part: str, pi: int, px, py, pw, ph):
    """Parse one prediction_unit's syntax (§7.3.8.6) and derive its
    motion record. The second PU of a split excludes the in-CU
    spatial merge candidate (§8.5.3.2.3: B1 for horizontal splits,
    A1 for vertical). B slices add inter_pred_idc and a second
    mvd/mvp pair for L1 (one reference per list, so no ref_idx
    syntax is ever present). inter_pred_idc always uses the 2-bin
    "1"/"0x" form — the spec's 1-bin special case for 8x4/4x8 PUs
    is a simplified-but-documented deviation under the module's
    marker-gate contract (both sides of this codec agree; the
    §8.5.3.2.2 no-bi RULE itself is honoured by the encoder and the
    merge-candidate conversion)."""
    st = sh["type"]
    no_a1 = part in _VERT_PARTS and pi == 1
    no_b1 = part in _HORIZ_PARTS and pi == 1
    if dec.bit(ctx, _MERGE_FLAG):
        midx = _code_merge_idx(dec, ctx, sh["max_merge"])
        cands = _merge_candidates(fr, px, py, pw, ph, sh["max_merge"],
                                  no_a1=no_a1, no_b1=no_b1,
                                  slice_type=st)
        return ("merge", midx), cands[midx]
    if st == 0:
        if dec.bit(ctx, _INTER_DIR + 0):
            d = 3                                 # PRED_BI
        else:
            d = 2 if dec.bit(ctx, _INTER_DIR + 1) else 1
    else:
        d = 1                                     # P: L0 implicit
    mvs, syn = [(0, 0), (0, 0)], []
    for l in (0, 1):
        if not (d & (1 << l)):
            continue
        mvd = _code_mvd_pair(dec, ctx)
        mvp = dec.bit(ctx, _MVP_FLAG)
        pred = _amvp_candidates(fr, px, py, pw, ph, lst=l,
                                poc=sh.get("poc", 0),
                                ref_pocs=sh.get("ref_pocs",
                                                (None, None)))[mvp]
        mvs[l] = (pred[0] + mvd[0], pred[1] + mvd[1])
        syn.append((mvd, mvp))
    return ("amvp", d, syn), (d, mvs[0], mvs[1])


def _dec_inter_residual(dec: _CabacDec, ctx: _Ctx5, log2_cb: int):
    """transform_tree at trafoDepth 0 for an inter CU under our
    fixed SPS (max_trafo_depth_inter = 1, so split_transform_flag is
    coded; only the unsplit TU == CU form is supported)."""
    if dec.bit(ctx, _SPLIT_TF + 5 - log2_cb):
        raise NotImplementedError("inter transform split unsupported")
    cbf_cb = dec.bit(ctx, _CBF_CHROMA + 0)
    cbf_cr = dec.bit(ctx, _CBF_CHROMA + 0)
    if cbf_cb or cbf_cr:
        cbf_l = dec.bit(ctx, _CBF_LUMA + 1)
    else:
        cbf_l = 1                # §7.3.8.8: inferred at inter depth 0
    lv_y = lv_cb = lv_cr = None
    if cbf_l:
        lv_y = _dec_residual5(dec, ctx, log2_cb, True, 0)
    if cbf_cb:
        lv_cb = _dec_residual5(dec, ctx, log2_cb - 1, False, 0)
    if cbf_cr:
        lv_cr = _dec_residual5(dec, ctx, log2_cb - 1, False, 0)
    return lv_y, lv_cb, lv_cr


def _dec_cu_inter(dec: _CabacDec, ctx: _Ctx5, fr: _Frame5,
                  refs, pps: dict, qp: int, x0: int, y0: int,
                  log2_cb: int, depth: int, sh: dict, bypass: bool):
    """Non-skip inter coding_unit body (P/B slices). part_mode
    follows Table 9-34: at CB16 (> min CB) with AMP enabled, bin2
    (bypass) picks symmetric vs asymmetric and bin3 (bypass) the
    asymmetric variant; at the minimum CB size the 2-bin form
    applies and AMP shapes are not available."""
    n = 1 << log2_cb
    if dec.bit(ctx, _PART_INTER + 0):
        part = "2Nx2N"
    else:
        horiz = dec.bit(ctx, _PART_INTER + 1)
        if log2_cb == 4 and sh.get("amp"):
            if dec.bypass():
                part = "2NxN" if horiz else "Nx2N"
            elif dec.bypass():
                part = "2NxnD" if horiz else "nRx2N"
            else:
                part = "2NxnU" if horiz else "nLx2N"
        else:
            part = "2NxN" if horiz else "Nx2N"
    pu_mvs = []
    merge_first = False
    cuid = fr.new_id()
    for pi, (px, py, pw, ph) in enumerate(_pu_geometry(part, x0, y0, n)):
        syn, mot = _dec_pu_motion(dec, ctx, fr, sh, part, pi,
                                  px, py, pw, ph)
        if pi == 0 and syn[0] == "merge":
            merge_first = True
        pu_mvs.append((px, py, pw, ph, mot))
        _mark_inter(fr, px, py, pw, ph, depth, mot, False)
        fr.mark_ids(px, py, pw, ph, cuid, fr.new_id())
    if part == "2Nx2N" and merge_first:
        rqt = 1                  # §7.3.8.5: inferred (else it'd be skip)
    else:
        rqt = dec.bit(ctx, _RQT_ROOT)
    lv_y = lv_cb = lv_cr = None
    if rqt:
        lv_y, lv_cb, lv_cr = _dec_inter_residual(dec, ctx, log2_cb)
    # luma cbf of the TU (== CU, spanning the PUs)
    fr.cbf[y0 // 4:(y0 + n) // 4, x0 // 4:(x0 + n) // 4] = \
        lv_y is not None
    preds = _inter_pred_planes(refs, x0, y0, n, pu_mvs)
    _recon_inter_cu(fr, x0, y0, n, preds, lv_y, lv_cb, lv_cr,
                    qp, bypass)


def _dec_cu(dec: _CabacDec, ctx: _Ctx5, fr: _Frame5, pps: dict,
            qp: int, x0: int, y0: int, log2_cb: int, depth: int,
            sh: dict | None = None, refs=None):
    """coding_unit (§7.3.8.5): intra, plus the P/B-slice inter forms
    (cu_skip / merge / AMVP / bi-prediction, part modes
    2Nx2N / 2NxN / Nx2N)."""
    bypass = False
    if pps["tq_bypass"]:
        bypass = bool(dec.bit(ctx, _TQ_BYPASS))
    if sh is not None and sh["type"] in (0, 1):
        n = 1 << log2_cb
        if dec.bit(ctx, _skip_ctx(fr, x0, y0)):
            midx = _code_merge_idx(dec, ctx, sh["max_merge"])
            mot = _merge_candidates(fr, x0, y0, n, n,
                                    sh["max_merge"],
                                    slice_type=sh["type"])[midx]
            preds = _inter_pred_planes(refs, x0, y0, n,
                                       [(x0, y0, n, n, mot)])
            _recon_inter_cu(fr, x0, y0, n, preds, None, None, None,
                            qp, bypass)
            _mark_inter(fr, x0, y0, n, n, depth, mot, True)
            cuid = fr.new_id()
            fr.mark_ids(x0, y0, n, n, cuid, cuid, cbf=False)
            return
        if not dec.bit(ctx, _PRED_MODE):
            _dec_cu_inter(dec, ctx, fr, refs, pps, qp, x0, y0,
                          log2_cb, depth, sh, bypass)
            return
    nxn = False
    if log2_cb == 3:
        nxn = not dec.bit(ctx, _PART_MODE)     # bin 1 -> PART_2Nx2N
    n_pu = 4 if nxn else 1
    pu = 1 << (log2_cb - (1 if nxn else 0))
    pu_xy = [(x0 + (i & 1) * pu, y0 + (i >> 1) * pu) for i in range(n_pu)]
    prevs = [dec.bit(ctx, _PREV_INTRA) for _ in range(n_pu)]
    modes = []
    for i, (px, py) in enumerate(pu_xy):
        mpm = _mpm_list(fr.modes, px // 4, py // 4, 4)
        m = _dec_luma_mode(dec, mpm, prevs[i])
        modes.append(m)
        bs = pu // 4
        fr.modes[py // 4:py // 4 + bs, px // 4:px // 4 + bs] = m
    if dec.bit(ctx, _CHROMA_MODE):
        ci = (dec.bypass() << 1) | dec.bypass()
    else:
        ci = 4
    cmode = _chroma_mode_from_idx(ci, modes[0])
    qpc = _chroma_qp(qp)
    # transform_tree: cbf_cb / cbf_cr first (log2TrafoSize > 2 at
    # trafoDepth 0 always holds for CB >= 8)
    cbf_cb = dec.bit(ctx, _CBF_CHROMA + 0)
    cbf_cr = dec.bit(ctx, _CBF_CHROMA + 0)
    cuid = fr.new_id()
    if not nxn:
        n = 1 << log2_cb
        cbf_l = dec.bit(ctx, _CBF_LUMA + 1)
        pred = _predict_tb(fr, fr.Y, x0, y0, n, modes[0], True)
        lv = None
        if cbf_l:
            lv = _dec_residual5(dec, ctx, log2_cb, True,
                                _scan_idx(modes[0], log2_cb, True))
        fr.Y[y0:y0 + n, x0:x0 + n] = _recon_tb(
            pred, lv, qp, log2_cb, True, bypass)
        _mark(fr, x0, y0, n, depth, modes[0])
        fr.mark_ids(x0, y0, n, n, cuid, cuid, cbf=lv is not None)
    else:
        for i, (px, py) in enumerate(pu_xy):
            cbf_l = dec.bit(ctx, _CBF_LUMA + 0)
            pred = _predict_tb(fr, fr.Y, px, py, 4, modes[i], True)
            lv = None
            if cbf_l:
                lv = _dec_residual5(dec, ctx, 2, True,
                                    _scan_idx(modes[i], 2, True))
            fr.Y[py:py + 4, px:px + 4] = _recon_tb(
                pred, lv, qp, 2, True, bypass)
            _mark(fr, px, py, 4, depth, modes[i])
            fr.mark_ids(px, py, 4, 4, cuid, cuid,
                        cbf=lv is not None)
    # chroma TB (log2_cb - 1; 4x4 when CB is 8)
    log2_c = log2_cb - 1
    nc = 1 << log2_c
    cx, cy = x0 // 2, y0 // 2
    for plane, cbf in ((fr.Cb, cbf_cb), (fr.Cr, cbf_cr)):
        pred = _predict_tb(fr, plane, cx, cy, nc, cmode, False)
        lv = None
        if cbf:
            lv = _dec_residual5(dec, ctx, log2_c, False,
                                _scan_idx(cmode, log2_c, False))
        plane[cy:cy + nc, cx:cx + nc] = _recon_tb(
            pred, lv, qpc, log2_c, False, bypass)


def _dec_quadtree(dec, ctx, fr, pps, qp, x0, y0, log2_cb, depth,
                  sh=None, refs=None):
    if log2_cb > 3:
        if dec.bit(ctx, _split_ctx(fr, x0, y0, depth)):
            h = 1 << (log2_cb - 1)
            for dy in (0, 1):
                for dx in (0, 1):
                    _dec_quadtree(dec, ctx, fr, pps, qp,
                                  x0 + dx * h, y0 + dy * h,
                                  log2_cb - 1, depth + 1, sh, refs)
            return
    _dec_cu(dec, ctx, fr, pps, qp, x0, y0, log2_cb, depth, sh, refs)


def _decode_slice(rbsp: bytes, sps: dict, pps: dict,
                  is_idr: bool = True,
                  dpb: dict | None = None) -> _Frame5:
    """Decode one slice segment. ``dpb`` maps POC -> decoded
    _Frame5 for the pictures still referenced; the slice's RPS
    deltas select L0 (poc - d0) and, for B, L1 (poc + d1)."""
    br = _Bits(rbsp)
    sh = _parse_slice_header(br, pps, is_idr=is_idr,
                             sao_present=bool(sps.get("sao", 0)))
    sh["amp"] = sps.get("amp", 0)
    refs = None
    if sh["type"] in (0, 1):
        if sps.get("max_trafo_depth_inter", 0) != 1:
            raise NotImplementedError(
                "P/B slices need max_transform_hierarchy_depth_inter "
                "1 (this codec's SPS; depth-0 forced inter RQT "
                "splits are unsupported)")
        poc = sh["poc_lsb"]
        sh["poc"] = poc
        l0_poc = poc - sh["d0"]
        l1_poc = poc + sh["d1"] if sh["type"] == 0 else None
        dpb = dpb or {}
        if l0_poc not in dpb or (l1_poc is not None
                                 and l1_poc not in dpb):
            raise ValueError(
                "inter slice references a picture missing from the "
                "decoded-picture buffer")
        refs = (dpb[l0_poc],
                dpb[l1_poc] if l1_poc is not None else None)
        sh["ref_pocs"] = (l0_poc, l1_poc)
    dec = _CabacDec(br)
    ctx = _Ctx5()
    fr = _Frame5(sps["w"], sps["h"])
    ctbs_w = sps["w"] // 16
    ctbs_h = sps["h"] // 16
    sao_on = sh["sao_luma"] or sh["sao_chroma"]
    sao_params: dict = {}
    for cy in range(ctbs_h):
        for cx in range(ctbs_w):
            if sao_on:
                sao_params[(cx, cy)] = _dec_sao(dec, ctx, cx, cy,
                                                sao_params, sh)
            _dec_quadtree(dec, ctx, fr, pps, sh["qp"],
                          cx * 16, cy * 16, 4, 0, sh, refs)
            eos = dec.terminate()
            last = (cy == ctbs_h - 1) and (cx == ctbs_w - 1)
            if bool(eos) != last:
                raise ValueError("end_of_slice_segment_flag mismatch")
    if pps.get("deblock"):
        _deblock(fr, sh["qp"], sh.get("ref_pocs", (None, None)))
    if sao_on:
        _apply_sao(fr, sao_params, ctbs_w, ctbs_h)
    fr_poc = 0 if is_idr else sh["poc_lsb"]
    fr.poc = fr_poc
    return fr


# ---------------------------------------------------------------------------
# encoder — commit-then-serialize per CU so context/grid state at
# every syntax element equals the decoder's parse-time state
# ---------------------------------------------------------------------------


def _sad(a: np.ndarray, b: np.ndarray) -> int:
    return int(np.abs(a - b).sum())


def _best_mode(fr: _Frame5, plane, src, x0, y0, n, is_luma, cands):
    # reference samples are identical for every candidate mode (the
    # plane/avail state does not change inside the loop) — gather
    # once, filter lazily, predict per mode: same preds as calling
    # _predict_tb per candidate
    left, top = _gather_refs(plane, fr.avail, x0, y0, n,
                             g=4 if is_luma else 2)
    fl = ft = None
    src_blk = src[y0:y0 + n, x0:x0 + n]
    best = (1 << 60, 0, None)
    for m in cands:
        if _use_filter(m, n, is_luma):
            if fl is None:
                fl, ft = _filter_refs(left, top)
            pred = _pred_intra(fl, ft, m, n, is_luma)
        else:
            pred = _pred_intra(left, top, m, n, is_luma)
        s = _sad(pred, src_blk)
        if s < best[0]:
            best = (s, m, pred)
    return best


def _tb_levels(pred, src_blk, qp, log2_tb, is_luma, bypass,
               intra=True):
    """Residual -> coded levels (or None when all-zero) plus the
    reconstruction the decoder will produce."""
    res = src_blk - pred
    if bypass:
        lv = res.astype(np.int64)
    else:
        coef = _fwd_transform(res,
                              _tb_matrix(1 << log2_tb, is_luma, intra),
                              log2_tb)
        lv = _quant(coef, qp, log2_tb)
    if not lv.any():
        return None, np.clip(pred, 0, 255)
    return lv, _recon_tb(pred, lv, qp, log2_tb, is_luma, bypass, intra)


def _commit_cu(fr: _Frame5, srcY, srcCb, srcCr, pps: dict, qp: int,
               x0: int, y0: int, log2_cb: int, depth: int,
               cands) -> dict:
    """Decide modes, reconstruct, update grids; return the syntax
    plan ``_serialize_cu`` replays. Greedy SAD mode decision (ties
    to the lowest mode index — deterministic)."""
    bypass = bool(pps["tq_bypass"])
    n = 1 << log2_cb
    nxn = False
    if log2_cb == 3:
        s8 = _best_mode(fr, fr.Y, srcY, x0, y0, 8, True, cands)[0]
        # NxN estimate assumes ideal sub-PU recon (source refs)
        est = 0
        save = fr.Y[y0:y0 + 8, x0:x0 + 8].copy()
        sava = fr.avail[y0 // 4:y0 // 4 + 2, x0 // 4:x0 // 4 + 2].copy()
        fr.Y[y0:y0 + 8, x0:x0 + 8] = srcY[y0:y0 + 8, x0:x0 + 8]
        fr.avail[y0 // 4:y0 // 4 + 2, x0 // 4:x0 // 4 + 2] = True
        for i in range(4):
            px, py = x0 + (i & 1) * 4, y0 + (i >> 1) * 4
            est += _best_mode(fr, fr.Y, srcY, px, py, 4, True, cands)[0]
        fr.Y[y0:y0 + 8, x0:x0 + 8] = save
        fr.avail[y0 // 4:y0 // 4 + 2, x0 // 4:x0 // 4 + 2] = sava
        nxn = est + 48 < s8
    n_pu = 4 if nxn else 1
    pu = n // (2 if nxn else 1)
    pu_xy = [(x0 + (i & 1) * pu, y0 + (i >> 1) * pu) for i in range(n_pu)]
    plan = {"bypass": bypass, "nxn": nxn, "log2_cb": log2_cb,
            "pu": [], "luma": []}
    log2_tb = log2_cb - (1 if nxn else 0)
    cuid = fr.new_id()
    for i, (px, py) in enumerate(pu_xy):
        mpm = _mpm_list(fr.modes, px // 4, py // 4, 4)
        _, m, pred = _best_mode(fr, fr.Y, srcY, px, py, pu, True, cands)
        plan["pu"].append((int(m in mpm), list(mpm), m))
        bs = pu // 4
        fr.modes[py // 4:py // 4 + bs, px // 4:px // 4 + bs] = m
        lv, rec = _tb_levels(pred, srcY[py:py + pu, px:px + pu], qp,
                             log2_tb, True, bypass)
        plan["luma"].append((lv, _scan_idx(m, log2_tb, True), log2_tb))
        fr.Y[py:py + pu, px:px + pu] = rec
        _mark(fr, px, py, pu, depth, m)
        fr.mark_ids(px, py, pu, pu, cuid, cuid, cbf=lv is not None)
    # chroma: best of DM + the 4 candidates (replacement rule applied)
    luma0 = plan["pu"][0][2]
    qpc = _chroma_qp(qp)
    log2_c = log2_cb - 1
    nc = 1 << log2_c
    cx, cy = x0 // 2, y0 // 2
    # chroma never reference-filters (_use_filter is False off-luma),
    # so one gather per plane serves all 5 candidate modes
    lb, tb2 = _gather_refs(fr.Cb, fr.avail, cx, cy, nc, g=2)
    lr, tr2 = _gather_refs(fr.Cr, fr.avail, cx, cy, nc, g=2)
    best = (1 << 60, 4, None, None)
    for idx in (4, 0, 1, 2, 3):
        cm = _chroma_mode_from_idx(idx, luma0)
        pb = _pred_intra(lb, tb2, cm, nc, False)
        pr = _pred_intra(lr, tr2, cm, nc, False)
        s = _sad(pb, srcCb[cy:cy + nc, cx:cx + nc]) + \
            _sad(pr, srcCr[cy:cy + nc, cx:cx + nc])
        if s < best[0]:
            best = (s, idx, pb, pr)
    _, ci, pb, pr = best
    cm = _chroma_mode_from_idx(ci, luma0)
    lv_cb, rec_cb = _tb_levels(pb, srcCb[cy:cy + nc, cx:cx + nc],
                               qpc, log2_c, False, bypass)
    lv_cr, rec_cr = _tb_levels(pr, srcCr[cy:cy + nc, cx:cx + nc],
                               qpc, log2_c, False, bypass)
    fr.Cb[cy:cy + nc, cx:cx + nc] = rec_cb
    fr.Cr[cy:cy + nc, cx:cx + nc] = rec_cr
    plan.update(chroma_idx=ci, lv_cb=lv_cb, lv_cr=lv_cr,
                scan_c=_scan_idx(cm, log2_c, False), log2_c=log2_c)
    return plan


def _search_mv(refY: np.ndarray, src_blk: np.ndarray, x0: int,
               y0: int, w: int, h: int, starts, rng: int) -> tuple:
    """Deterministic motion search: integer full search in a
    ±``rng`` window around each (deduplicated, integer-rounded)
    start vector, then two rounds of quarter-pel 8-neighbour
    refinement. Ties break lexicographically on (SAD, mv).

    The C kernel (gs_h265_search_mv) runs the identical integer
    search + DCT-IF refinement when available; the numpy path below
    is the correctness reference and silent fallback — parity is
    pinned by tests/test_h265_search_native.py."""
    r = h265_search_mv_native(refY, src_blk, x0, y0, w, h,
                              list(starts), rng)
    if r is not None:
        return r
    # Integer stage, vectorized: a full-pel prediction is exactly an
    # edge-clamped window of the reference (the << 6 / (+32) >> 6
    # chain of _mc_plane is the identity on 0..255), and clipping an
    # arange commutes with taking a contiguous slice — so the union
    # window of one search centre, edge-clamped once, contains every
    # candidate's clamped window as a direct sub-view. One
    # sliding_window_view + SAD reduction replaces (2*rng+1)^2
    # _mc_luma calls; argmin over a dx-major ravel is the same
    # lexicographic (sad, mvx, mvy) winner as the scalar loop, and
    # min-per-window over min-across-windows equals the min over the
    # deduplicated candidate union, so results are bit-identical.
    H, W = refY.shape
    src16 = src_blk.astype(np.int16)
    side = 2 * rng + 1
    best = None
    done = set()
    for sx, sy in list(starts) + [(0, 0)]:
        sx, sy = (sx >> 2) << 2, (sy >> 2) << 2
        if (sx, sy) in done:
            continue
        done.add((sx, sy))
        cx, cy = sx >> 2, sy >> 2
        ys = np.arange(y0 + cy - rng, y0 + cy + rng + h).clip(0, H - 1)
        xs = np.arange(x0 + cx - rng, x0 + cx + rng + w).clip(0, W - 1)
        win = refY[ys[:, None], xs].astype(np.int16)
        sads = np.abs(_win2(win, h, w) - src16).sum(
            axis=(2, 3), dtype=np.int64)           # [dy, dx]
        flat = sads.T.ravel()                      # dx-major order
        i = int(flat.argmin())
        mv = (sx + 4 * (i // side - rng), sy + 4 * (i % side - rng))
        cand = (int(flat[i]), mv)
        if best is None or cand < best:
            best = cand
    # quarter-pel refinement: skipping an already-evaluated candidate
    # is exact (its equal (s, mv) never wins the strict <), and a
    # round that does not move the best makes the next round a
    # no-op — break instead of re-evaluating the same 8 neighbours
    seen = set()
    for _ in range(2):
        s0, (mx, my) = best
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if not dx and not dy:
                    continue
                mv = (mx + dx, my + dy)
                if mv in seen:
                    continue
                seen.add(mv)
                pred = _mc_luma(refY, x0, y0, w, h, mv)
                s = _sad(pred, src_blk)
                if (s, mv) < best:
                    best = (s, mv)
        if best[1] == (mx, my):
            break
    return best


def _pu_repr(fr: _Frame5, part: str, pi: int, px, py, pw, ph,
             mot, sh: dict):
    """Choose the cheapest syntax that yields motion ``mot`` for
    this PU: lowest-index merge candidate, else AMVP (per active
    list) with the smaller-|mvd| predictor. Returns the syntax
    tuple ``_serialize_cu_inter`` replays."""
    no_a1 = part in _VERT_PARTS and pi == 1
    no_b1 = part in _HORIZ_PARTS and pi == 1
    cands = _merge_candidates(fr, px, py, pw, ph, sh["max_merge"],
                              no_a1=no_a1, no_b1=no_b1,
                              slice_type=sh["type"])
    if mot in cands:
        return ("merge", cands.index(mot))
    d = mot[0]
    syn = []
    for l in (0, 1):
        if not (d & (1 << l)):
            continue
        preds = _amvp_candidates(fr, px, py, pw, ph, lst=l,
                                 poc=sh.get("poc", 0),
                                 ref_pocs=sh.get("ref_pocs",
                                                 (None, None)))
        mv = mot[1 + l]
        costs = []
        for flag, pr in enumerate(preds):
            mvd = (mv[0] - pr[0], mv[1] - pr[1])
            costs.append((abs(mvd[0]) + abs(mvd[1]), flag, mvd))
        _, flag, mvd = min(costs)
        syn.append((mvd, flag))
    return ("amvp", d, syn)


def _search_pu(fr: _Frame5, refs, sh: dict, srcY, px, py, pw, ph,
               search: int, starts):
    """Best motion record for one PU: searched L0 (and for B: L1,
    plus the bi combination of the two winners), against the merge
    candidates' implied predictions. Returns (sad, mot) with the
    deterministic lexicographic tie-break."""
    src_blk = srcY[py:py + ph, px:px + pw]
    s0, mv0 = _search_mv(refs[0].Y, src_blk, px, py, pw, ph,
                         [m[1] for m in starts if m[0] & 1], search)
    best = (s0, (1, mv0, (0, 0)))
    if sh["type"] == 0:
        s1, mv1 = _search_mv(refs[1].Y, src_blk, px, py, pw, ph,
                             [m[2] for m in starts if m[0] & 2],
                             search)
        if (s1, 1) < (best[0], 0):
            best = (s1, (2, (0, 0), mv1))
        if pw + ph != 12:        # no 8x4/4x8 bi (§8.5.3.2.2)
            p0 = _mc_luma(refs[0].Y, px, py, pw, ph, mv0,
                          finalize=False)
            p1 = _mc_luma(refs[1].Y, px, py, pw, ph, mv1,
                          finalize=False)
            sbi = _sad(np.clip((p0 + p1 + 64) >> 7, 0, 255), src_blk)
            if sbi < best[0]:
                best = (sbi, (3, mv0, mv1))
    return best


def _commit_cu_p(fr: _Frame5, refs, srcY, srcCb, srcCr,
                 pps: dict, qp: int, x0: int, y0: int, log2_cb: int,
                 depth: int, sh: dict, cands, search: int):
    """P/B-slice CU decision: try inter (2Nx2N, and the two-PU
    splits when they clearly win), fall back to the intra path when
    intra predicts better. Commit-then-serialize like the intra
    path: all grid state a later syntax element's context or
    candidate derivation reads is updated here, and
    ``_serialize_cu`` merely replays the recorded plan."""
    bypass = bool(pps["tq_bypass"])
    n = 1 << log2_cb
    src_blk = srcY[y0:y0 + n, x0:x0 + n]
    merge0 = _merge_candidates(fr, x0, y0, n, n, sh["max_merge"],
                               slice_type=sh["type"])
    starts = list(dict.fromkeys(merge0))
    # merge candidates evaluated as full motion records (their
    # bi/uni prediction may beat any searched uni vector)
    best_merge = None
    for mot in starts:
        pY = _pu_pred(refs, x0, y0, n, n, mot)[0]
        s = _sad(pY, src_blk)
        if best_merge is None or (s, mot) < best_merge:
            best_merge = (s, mot)
    sad2n, mot2n = _search_pu(fr, refs, sh, srcY, x0, y0, n, n,
                              search, starts)
    if best_merge is not None and best_merge[0] <= sad2n:
        sad2n, mot2n = best_merge
    # two-PU splits: independent searches per half; a fixed
    # lexicographic penalty keeps the decision deterministic and
    # biased to the simpler mode on ties
    part, pu_mvs, sad_inter = "2Nx2N", [(x0, y0, n, n, mot2n)], sad2n
    trial_parts = ("2NxN", "Nx2N")
    if log2_cb == 4 and sh.get("amp"):
        trial_parts += ("2NxnU", "2NxnD", "nLx2N", "nRx2N")
    for cand_part in trial_parts:
        geo = _pu_geometry(cand_part, x0, y0, n)
        tot, mvs = 0, []
        for px, py, pw, ph in geo:
            s, mot = _search_pu(fr, refs, sh, srcY, px, py, pw, ph,
                                search, starts)
            tot += s
            mvs.append((px, py, pw, ph, mot))
        if tot + 64 < sad_inter:
            part, pu_mvs, sad_inter = cand_part, mvs, tot
    skip_ctx = _skip_ctx(fr, x0, y0)
    # intra estimate on luma (same greedy cost as the intra path);
    # ties go to inter — skip/merge is the cheaper representation
    sad_intra = _best_mode(fr, fr.Y, srcY, x0, y0, n, True, cands)[0]
    if sad_intra < sad_inter:
        plan = _commit_cu(fr, srcY, srcCb, srcCr, pps, qp,
                          x0, y0, log2_cb, depth, cands)
        plan["skip_ctx"] = skip_ctx
        return plan
    preds = _inter_pred_planes(refs, x0, y0, n, pu_mvs)
    plan = {"inter": True, "bypass": bypass, "log2_cb": log2_cb,
            "part": part, "pus": [], "skip": False,
            "skip_ctx": skip_ctx, "slice_type": sh["type"],
            "amp": sh.get("amp", 0)}
    cuid = fr.new_id()
    for pi, (px, py, pw, ph, mot) in enumerate(pu_mvs):
        plan["pus"].append(_pu_repr(fr, part, pi, px, py, pw, ph,
                                    mot, sh))
        _mark_inter(fr, px, py, pw, ph, depth, mot, False)
        fr.mark_ids(px, py, pw, ph, cuid, fr.new_id())
    lv_y, rec_y = _tb_levels(preds[0], src_blk, qp, log2_cb, True,
                             bypass, intra=False)
    qpc = _chroma_qp(qp)
    nc = n // 2
    cx, cy = x0 // 2, y0 // 2
    lv_cb, rec_cb = _tb_levels(preds[1], srcCb[cy:cy + nc, cx:cx + nc],
                               qpc, log2_cb - 1, False, bypass,
                               intra=False)
    lv_cr, rec_cr = _tb_levels(preds[2], srcCr[cy:cy + nc, cx:cx + nc],
                               qpc, log2_cb - 1, False, bypass,
                               intra=False)
    all_zero = lv_y is None and lv_cb is None and lv_cr is None
    merge_first = plan["pus"][0][0] == "merge"
    if part == "2Nx2N" and merge_first and all_zero:
        # a zero-residual 2Nx2N merge MUST be coded as cu_skip
        # (rqt_root_cbf is inferred 1 for non-skip 2Nx2N merge)
        plan["skip"] = True
        plan["pus"] = [plan["pus"][0]]
        fr.skip[y0 // 4:(y0 + n) // 4, x0 // 4:(x0 + n) // 4] = True
    plan.update(lv_y=lv_y, lv_cb=lv_cb, lv_cr=lv_cr,
                rqt=0 if all_zero else 1, merge_first=merge_first)
    fr.cbf[y0 // 4:(y0 + n) // 4, x0 // 4:(x0 + n) // 4] = \
        lv_y is not None
    fr.Y[y0:y0 + n, x0:x0 + n] = rec_y
    fr.Cb[cy:cy + nc, cx:cx + nc] = rec_cb
    fr.Cr[cy:cy + nc, cx:cx + nc] = rec_cr
    return plan


def _serialize_cu_inter(enc: _CabacEnc, ctx: _Ctx5, pps: dict,
                        plan: dict):
    if pps["tq_bypass"]:
        enc.bit(ctx, _TQ_BYPASS, int(plan["bypass"]))
    max_merge = plan["max_merge"]
    if plan["skip"]:
        enc.bit(ctx, plan["skip_ctx"], 1)
        _code_merge_idx(enc, ctx, max_merge, v=plan["pus"][0][1])
        return
    enc.bit(ctx, plan["skip_ctx"], 0)
    enc.bit(ctx, _PRED_MODE, 0)
    part = plan["part"]
    enc.bit(ctx, _PART_INTER + 0, 1 if part == "2Nx2N" else 0)
    if part != "2Nx2N":
        enc.bit(ctx, _PART_INTER + 1,
                1 if part in _HORIZ_PARTS else 0)
        if plan["log2_cb"] == 4 and plan.get("amp"):
            sym = part in ("2NxN", "Nx2N")
            enc.bypass(1 if sym else 0)
            if not sym:
                enc.bypass(1 if part in ("2NxnD", "nRx2N") else 0)
    for syn in plan["pus"]:
        if syn[0] == "merge":
            enc.bit(ctx, _MERGE_FLAG, 1)
            _code_merge_idx(enc, ctx, max_merge, v=syn[1])
        else:
            enc.bit(ctx, _MERGE_FLAG, 0)
            _syn, d, lists = syn
            if plan.get("slice_type", 1) == 0:
                enc.bit(ctx, _INTER_DIR + 0, 1 if d == 3 else 0)
                if d != 3:
                    enc.bit(ctx, _INTER_DIR + 1, 1 if d == 2 else 0)
            for mvd, flag in lists:
                _code_mvd_pair(enc, ctx, mv=mvd)
                enc.bit(ctx, _MVP_FLAG, flag)
    if not (part == "2Nx2N" and plan["merge_first"]):
        enc.bit(ctx, _RQT_ROOT, plan["rqt"])
    if plan["rqt"]:
        log2_cb = plan["log2_cb"]
        enc.bit(ctx, _SPLIT_TF + 5 - log2_cb, 0)
        enc.bit(ctx, _CBF_CHROMA + 0, int(plan["lv_cb"] is not None))
        enc.bit(ctx, _CBF_CHROMA + 0, int(plan["lv_cr"] is not None))
        if plan["lv_cb"] is not None or plan["lv_cr"] is not None:
            enc.bit(ctx, _CBF_LUMA + 1, int(plan["lv_y"] is not None))
        elif plan["lv_y"] is None:
            raise AssertionError("all-zero inter residual with rqt set")
        if plan["lv_y"] is not None:
            _enc_residual5(enc, ctx, plan["lv_y"], log2_cb, True, 0)
        for lv in (plan["lv_cb"], plan["lv_cr"]):
            if lv is not None:
                _enc_residual5(enc, ctx, lv, log2_cb - 1, False, 0)


def _serialize_cu(enc: _CabacEnc, ctx: _Ctx5, pps: dict, plan: dict,
                  sh: dict | None = None):
    if plan.get("inter"):
        plan["max_merge"] = sh["max_merge"]
        _serialize_cu_inter(enc, ctx, pps, plan)
        return
    if pps["tq_bypass"]:
        enc.bit(ctx, _TQ_BYPASS, int(plan["bypass"]))
    if sh is not None and sh["type"] in (0, 1):
        # intra CU inside a P/B slice: cu_skip 0 + pred_mode 1
        enc.bit(ctx, plan["skip_ctx"], 0)
        enc.bit(ctx, _PRED_MODE, 1)
    if plan["log2_cb"] == 3:
        enc.bit(ctx, _PART_MODE, 0 if plan["nxn"] else 1)
    for prev, _mpm, _m in plan["pu"]:
        enc.bit(ctx, _PREV_INTRA, prev)
    for _prev, mpm, m in plan["pu"]:
        _code_luma_mode(enc, ctx, mpm, mode=m)
    ci = plan["chroma_idx"]
    if ci == 4:
        enc.bit(ctx, _CHROMA_MODE, 0)
    else:
        enc.bit(ctx, _CHROMA_MODE, 1)
        enc.bypass((ci >> 1) & 1)
        enc.bypass(ci & 1)
    enc.bit(ctx, _CBF_CHROMA + 0, int(plan["lv_cb"] is not None))
    enc.bit(ctx, _CBF_CHROMA + 0, int(plan["lv_cr"] is not None))
    cbf_ctx = _CBF_LUMA + (0 if plan["nxn"] else 1)
    for lv, scan, log2_tb in plan["luma"]:
        enc.bit(ctx, cbf_ctx, int(lv is not None))
        if lv is not None:
            _enc_residual5(enc, ctx, lv, log2_tb, True, scan)
    for lv in (plan["lv_cb"], plan["lv_cr"]):
        if lv is not None:
            _enc_residual5(enc, ctx, lv, plan["log2_c"], False,
                           plan["scan_c"])


def _enc_quadtree(ops, fr, srcY, srcCb, srcCr, pps, qp,
                  x0, y0, log2_cb, depth, cands, force_split,
                  sh=None, refs=None, search=4):
    """Commit pass over one quadtree: reconstructs + updates grids
    and appends the serialization ops (split bits with their
    ctxInc, CU plans) to ``ops``. Serialization is REPLAYED after
    the CTB's sao() syntax is chosen — legal because every
    grid-dependent ctxInc is computed here, at the same walk
    position where the decoder derives it (sao params depend on the
    CTB's reconstruction, which only exists after this pass)."""
    if log2_cb > 3:
        if force_split is not None:
            split = bool(force_split)
        else:
            n = 1 << log2_cb
            q = srcY[y0:y0 + n, x0:x0 + n].reshape(2, n // 2, 2,
                                                   n // 2)
            means = q.mean(axis=(1, 3))
            split = float(means.max() - means.min()) > 24.0
        ops.append(("split", _split_ctx(fr, x0, y0, depth),
                    int(split)))
        if split:
            h = 1 << (log2_cb - 1)
            for dy in (0, 1):
                for dx in (0, 1):
                    _enc_quadtree(ops, fr, srcY, srcCb, srcCr,
                                  pps, qp, x0 + dx * h, y0 + dy * h,
                                  log2_cb - 1, depth + 1, cands,
                                  force_split, sh, refs, search)
            return
    if sh is not None and sh["type"] in (0, 1):
        plan = _commit_cu_p(fr, refs, srcY, srcCb, srcCr, pps, qp,
                            x0, y0, log2_cb, depth, sh, cands, search)
    else:
        plan = _commit_cu(fr, srcY, srcCb, srcCr, pps, qp, x0, y0,
                          log2_cb, depth, cands)
    ops.append(("cu", plan))


_ALL_MODES = tuple(range(35))


def _encode_frame(srcY, srcCb, srcCr, sps_w, sps_h, pps, qp,
                  cands=_ALL_MODES, force_split=None,
                  refs=None, poc: int = 0, search: int = 4,
                  sao: bool = False):
    """Encode one frame's slice NAL (header + CABAC data); returns
    (nal_bytes, reconstruction _Frame5). ``refs is None`` emits an
    IDR I slice; ``(refL0, None)`` a TRAIL_R P slice; ``(refL0,
    refL1)`` with a non-None second element a TRAIL_R B slice
    (L0 = past, L1 = future, POC distances from the frames'
    ``poc`` fields)."""
    fr = _Frame5(sps_w, sps_h)
    fr.poc = poc
    # SAO never pairs with transquant bypass here: it would perturb
    # the lossless exactness the bypass families are built on
    sao_on = bool(sao) and not pps["tq_bypass"]
    bw = _BitW()
    if refs is None:
        sh = None
        _write_slice_header(bw, qp_delta=qp - pps["qp"], sao=sao_on)
    else:
        st = 0 if refs[1] is not None else 1
        d0 = poc - refs[0].poc
        d1 = refs[1].poc - poc if st == 0 else 0
        if d0 <= 0 or (st == 0 and d1 <= 0):
            raise ValueError("reference POCs must bracket the frame")
        sh = {"type": st, "poc": poc, "max_merge": 5, "amp": 1,
              "ref_pocs": (refs[0].poc,
                           refs[1].poc if st == 0 else None)}
        _write_slice_header(bw, qp_delta=qp - pps["qp"],
                            slice_type=st, poc_lsb=poc,
                            d0=d0, d1=max(d1, 1), sao=sao_on)
    sao_sh = {"sao_luma": int(sao_on), "sao_chroma": int(sao_on)}
    enc = _CabacEnc()
    ctx = _Ctx5()
    ctbs_w, ctbs_h = sps_w // 16, sps_h // 16
    sao_params: dict = {}
    for cy in range(ctbs_h):
        for cx in range(ctbs_w):
            ops: list = []
            _enc_quadtree(ops, fr, srcY, srcCb, srcCr, pps, qp,
                          cx * 16, cy * 16, 4, 0, cands, force_split,
                          sh, refs, search)
            if sao_on:
                params = (
                    _sao_choose_comp(srcY, fr.Y, cx * 16, cy * 16,
                                     16),
                    _sao_choose_comp(srcCb, fr.Cb, cx * 8, cy * 8,
                                     8),
                    _sao_choose_comp(srcCr, fr.Cr, cx * 8, cy * 8,
                                     8))
                _ser_sao(enc, ctx, cx, cy, params, sao_params,
                         sao_sh)
                sao_params[(cx, cy)] = params
            for op in ops:
                if op[0] == "split":
                    enc.bit(ctx, op[1], op[2])
                else:
                    _serialize_cu(enc, ctx, pps, op[1], sh)
            last = (cy == ctbs_h - 1) and (cx == ctbs_w - 1)
            enc.terminate(int(last))
    if pps.get("deblock"):
        _deblock(fr, qp, sh["ref_pocs"] if sh else (None, None))
    if sao_on:
        _apply_sao(fr, sao_params, ctbs_w, ctbs_h)
    rbsp = bw.bytes() + enc.bytes()
    nal_type = _NAL_IDR_W_RADL if refs is None else _NAL_TRAIL_R
    return _nal(nal_type, rbsp), fr


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def _pad_plane(p: np.ndarray, mult: int) -> np.ndarray:
    h, w = p.shape
    ph = (mult - h % mult) % mult
    pw = (mult - w % mult) % mult
    if ph or pw:
        p = np.pad(p, ((0, ph), (0, pw)), mode="edge")
    return p


def h265_encode_planes(Y, Cb, Cr, qp: int = 32, lossless: bool = False,
                       cands=_ALL_MODES, force_split=None,
                       sao: bool = True,
                       deblock: bool = True) -> bytes:
    """Encode 4:2:0 planes (uint8; Cb/Cr at half resolution) to an
    Annex-B HEVC stream: VPS + SPS + PPS + gorillaspark marker SEI +
    one IDR access unit. Non-CTB-multiple sizes are edge-padded and
    signalled via the SPS conformance window."""
    Y = np.asarray(Y, dtype=np.int64)
    Cb = np.asarray(Cb, dtype=np.int64)
    Cr = np.asarray(Cr, dtype=np.int64)
    h, w = Y.shape
    if h % 2 or w % 2 or h == 0 or w == 0:
        # the 4:2:0 conformance window counts in 2-sample units
        raise ValueError("4:2:0 frame dimensions must be even")
    if Cb.shape != (h // 2, w // 2) or Cb.shape != Cr.shape:
        raise ValueError("chroma planes must be half-resolution 4:2:0")
    pY = _pad_plane(Y, 16)
    pCb = _pad_plane(Cb, 8)
    pCr = _pad_plane(Cr, 8)
    H, W = pY.shape
    crop = (0, W - w, 0, H - h)
    bw = _BitW()
    _write_vps(bw)
    out = _nal(_NAL_VPS, bw.bytes())
    bw = _BitW()
    _write_sps(bw, W, H, crop=crop)
    out += _nal(_NAL_SPS, bw.bytes())
    dbf = bool(deblock) and not lossless
    bw = _BitW()
    _write_pps(bw, qp, transquant_bypass=lossless, deblock=dbf)
    out += _nal(_NAL_PPS, bw.bytes())
    out += _marker_sei()
    pps = {"qp": qp, "tq_bypass": 1 if lossless else 0,
           "deblock": 1 if dbf else 0}
    nal, _fr = _encode_frame(pY, pCb, pCr, W, H, pps, qp,
                             cands=cands, force_split=force_split,
                             sao=sao)
    return out + nal


def _b_coding_order(n: int) -> list:
    """(display_idx, slice_type, l0_idx, l1_idx) in coding order for
    an I-B-P ladder: even frames are P pictures referencing the
    previous even frame; each odd frame is a B picture referencing
    its display neighbours (decoded out of display order — the
    future P first)."""
    order = [(0, 2, None, None)]
    i = 2
    while i < n:
        order.append((i, 1, i - 2, None))
        order.append((i - 1, 0, i - 2, i))
        i += 2
    if n >= 2 and n % 2 == 0:
        order.append((n - 1, 1, n - 2, None))
    return order


def h265_encode_gop_planes(frames: list, qp: int = 32,
                           lossless: bool = False, cands=_ALL_MODES,
                           force_split=None, search: int = 4,
                           recon_out: list | None = None,
                           b_frames: bool = False,
                           sao: bool = True,
                           deblock: bool = True):
    """Encode a GOP of 4:2:0 plane triples (Y, Cb, Cr) to one
    Annex-B HEVC stream. Default: frame 0 is an IDR I picture,
    every later frame a TRAIL_R P picture referencing its
    predecessor. ``b_frames=True`` codes the I-B-P ladder of
    :func:`_b_coding_order` instead — odd display positions become
    B pictures (bi-prediction over both display neighbours), and
    the NALs are emitted in CODING order (the stream carries POCs;
    decode returns display order). ``search`` bounds the integer
    motion-search window per start vector. ``recon_out`` (when a
    list) receives the per-frame encoder reconstructions in DISPLAY
    order after the call. Returns the Annex-B bytes; with
    ``b_frames`` the display-order-index list of each emitted NAL
    is available via the POCs themselves."""
    if not frames:
        raise ValueError("empty GOP")
    if len(frames) > 255:
        raise ValueError("GOP too long for 8-bit POC lsb")
    h, w = np.asarray(frames[0][0]).shape
    planes = []
    for Y, Cb, Cr in frames:
        Y = np.asarray(Y, dtype=np.int64)
        Cb = np.asarray(Cb, dtype=np.int64)
        Cr = np.asarray(Cr, dtype=np.int64)
        if Y.shape != (h, w):
            raise ValueError("GOP frames must share dimensions")
        if h % 2 or w % 2 or h == 0 or w == 0:
            raise ValueError("4:2:0 frame dimensions must be even")
        if Cb.shape != (h // 2, w // 2) or Cb.shape != Cr.shape:
            raise ValueError("chroma planes must be half-resolution "
                             "4:2:0")
        planes.append((_pad_plane(Y, 16), _pad_plane(Cb, 8),
                       _pad_plane(Cr, 8)))
    H, W = planes[0][0].shape
    crop = (0, W - w, 0, H - h)
    bw = _BitW()
    _write_vps(bw)
    out = _nal(_NAL_VPS, bw.bytes())
    bw = _BitW()
    _write_sps(bw, W, H, crop=crop)
    out += _nal(_NAL_SPS, bw.bytes())
    dbf = bool(deblock) and not lossless
    bw = _BitW()
    _write_pps(bw, qp, transquant_bypass=lossless, deblock=dbf)
    out += _nal(_NAL_PPS, bw.bytes())
    out += _marker_sei()
    pps = {"qp": qp, "tq_bypass": 1 if lossless else 0,
           "deblock": 1 if dbf else 0}
    if b_frames:
        order = _b_coding_order(len(frames))
    else:
        order = [(i, 2 if i == 0 else 1, i - 1 if i else None, None)
                 for i in range(len(frames))]
    recons: dict[int, _Frame5] = {}
    for disp, st, l0, l1 in order:
        pY, pCb, pCr = planes[disp]
        refs = None
        if st != 2:
            refs = (recons[l0],
                    recons[l1] if l1 is not None else None)
        nal, fr = _encode_frame(pY, pCb, pCr, W, H, pps, qp,
                                cands=cands, force_split=force_split,
                                refs=refs, poc=disp, search=search,
                                sao=sao)
        out += nal
        recons[disp] = fr
    if recon_out is not None:
        # what a conformant decode must produce (uncropped), in
        # display order — the pixel-parity anchor for the tests
        for i in range(len(frames)):
            fr = recons[i]
            recon_out.append((fr.Y.copy(), fr.Cb.copy(),
                              fr.Cr.copy()))
    return out


def h265_encode_gop(frames: list, qp: int = 32, lossless: bool = False,
                    cands=_ALL_MODES, force_split=None,
                    search: int = 4, recon_out: list | None = None,
                    b_frames: bool = False,
                    sao: bool = True,
                    deblock: bool = True) -> bytes:
    """GOP form of :func:`h265_encode`: a list of 2-D luma arrays
    (neutral chroma) or (Y, Cb, Cr) triples."""
    trips = []
    for f in frames:
        if isinstance(f, (tuple, list)):
            trips.append(tuple(np.asarray(p) for p in f))
        else:
            y = np.asarray(f)
            if y.ndim != 2:
                raise ValueError("GOP frames must be 2-D luma arrays "
                                 "or (Y, Cb, Cr) triples")
            h, w = y.shape
            ch, cw = (h + 1) // 2, (w + 1) // 2
            trips.append((y, np.full((ch, cw), 128, dtype=np.uint8),
                          np.full((ch, cw), 128, dtype=np.uint8)))
    return h265_encode_gop_planes(trips, qp=qp, lossless=lossless,
                                  cands=cands, force_split=force_split,
                                  search=search, recon_out=recon_out,
                                  b_frames=b_frames, sao=sao,
                                  deblock=deblock)


def h265_encode(y: np.ndarray, qp: int = 32, cb=None, cr=None,
                lossless: bool = False, cands=_ALL_MODES,
                force_split=None, sao: bool = True,
                deblock: bool = True) -> bytes:
    """Encode a grayscale (neutral-chroma) or YCbCr 4:2:0 image."""
    y = np.asarray(y)
    if y.ndim != 2:
        raise ValueError("h265_encode takes a 2-D luma array")
    h, w = y.shape
    ch, cw = (h + 1) // 2, (w + 1) // 2
    if cb is None:
        cb = np.full((ch, cw), 128, dtype=np.uint8)
    if cr is None:
        cr = np.full((ch, cw), 128, dtype=np.uint8)
    return h265_encode_planes(y, cb, cr, qp=qp, lossless=lossless,
                              cands=cands, force_split=force_split,
                              sao=sao, deblock=deblock)


def h265_encoder_reconstruction(y, qp: int = 32, cb=None, cr=None,
                                lossless: bool = False,
                                cands=_ALL_MODES, force_split=None,
                                sao: bool = True,
                                deblock: bool = True):
    """The encoder's own reconstruction (= what a conformant decode
    of its stream must produce), cropped — the pixel-parity test
    anchor, mirroring h264.h264_encoder_reconstruction."""
    payload = h265_encode(y, qp=qp, cb=cb, cr=cr, lossless=lossless,
                          cands=cands, force_split=force_split,
                          sao=sao, deblock=deblock)
    return h265_decode_planes(payload)


def h265_decode_gop_planes(payload: bytes):
    """Decode an Annex-B HEVC stream (VPS/SPS/PPS + IDR and TRAIL
    P/B access units) to a list of uncropped (Y, Cb, Cr) int64 frame
    planes (display/POC order) plus the SPS conformance-window crop.
    Inter slices reference pictures from a POC-keyed multi-picture
    DPB (two lists for B); an IDR resets the chain."""
    sps = pps = None
    slices = []                  # (is_idr, rbsp) in decode order
    marker = False
    for nal_type, layer_id, _tid, rbsp in _split_annexb_h265(payload):
        if layer_id:
            raise NotImplementedError("multi-layer HEVC unsupported")
        if nal_type == _NAL_VPS:
            _parse_vps(_Bits(rbsp))
        elif nal_type == _NAL_SPS:
            sps = _parse_sps(_Bits(rbsp))
        elif nal_type == _NAL_PPS:
            pps = _parse_pps(_Bits(rbsp))
        elif nal_type in (_NAL_IDR_W_RADL, _NAL_IDR_N_LP):
            slices.append((True, rbsp))
        elif nal_type in (_NAL_TRAIL_N, _NAL_TRAIL_R):
            slices.append((False, rbsp))
        elif nal_type in (39, 40):
            marker = marker or _GS_HEVC_UUID in rbsp
        elif nal_type < 32:
            raise NotImplementedError(
                f"HEVC NAL type {nal_type} unsupported (IDR + TRAIL "
                "only; CRA/RASL/BLA random-access structures are not "
                "modelled by this codec)")
        # AUD(35)/EOS(36)/EOB(37)/filler(38): ignored
    if sps is None or pps is None or not slices:
        raise ValueError("stream lacks SPS, PPS or a coded slice")
    if not slices[0][0]:
        raise ValueError("stream does not start with an IDR picture")
    if not marker:
        raise NotImplementedError(
            "third-party HEVC stream unsupported: this codec's CABAC "
            "context tables are regenerated, not the spec literals, "
            "so decode only accepts gorillaspark-marked streams "
            "rather than risk a silent misdecode (see module "
            "docstring; substituting the spec's initValue tables "
            "restores interop)")
    n_ctbs = (sps["w"] // 16) * (sps["h"] // 16)
    if n_ctbs > 1 << 20:
        raise ValueError("implausible frame dimensions")
    if n_ctbs > 8 * len(payload):
        raise ValueError("frame dimensions implausible for payload size")
    if n_ctbs * len(slices) > 1 << 22:
        raise ValueError("implausible stream size for frame dimensions")
    frames = []                  # (segment, poc, planes) for ordering
    seg = -1
    dpb: dict = {}
    for is_idr, rbsp in slices:
        if is_idr:
            seg += 1
            dpb = {}
        fr = _decode_slice(rbsp, sps, pps, is_idr=is_idr, dpb=dpb)
        if fr.poc in dpb:
            raise ValueError("duplicate POC within a coded video "
                             "sequence")
        dpb[fr.poc] = fr
        frames.append((seg, fr.poc, (fr.Y, fr.Cb, fr.Cr)))
    # output order: stream order of IDR segments, POC order within
    # (B pictures decode after their future reference)
    frames.sort(key=lambda t: (t[0], t[1]))
    return [planes for _seg, _poc, planes in frames], sps["crop"]


def h265_decode_planes(payload: bytes):
    """Single-access-unit form of :func:`h265_decode_gop_planes`."""
    frames, crop = h265_decode_gop_planes(payload)
    if len(frames) != 1:
        raise ValueError(
            f"expected one access unit, stream holds {len(frames)}")
    Y, Cb, Cr = frames[0]
    return Y, Cb, Cr, crop


def h265_decode(payload: bytes) -> np.ndarray:
    """Decode an Annex-B HEVC access unit to (h, w, 3) uint8 RGB
    (same 4:2:0 upsample + JFIF conversion as the H.264/JPEG paths).
    h264._planes_to_rgb counts crop in 2-sample units; this codec's
    conformance window is kept in luma samples (always even)."""
    from .h264 import _planes_to_rgb
    Y, Cb, Cr, crop = h265_decode_planes(payload)
    return _planes_to_rgb(Y, Cb, Cr, tuple(c // 2 for c in crop))


def h265_decode_gop(payload: bytes) -> list:
    """Decode an HEVC stream (IDR + TRAIL P/B pictures) to a list of
    RGB frames in display (POC) order."""
    from .h264 import _planes_to_rgb
    frames, crop = h265_decode_gop_planes(payload)
    crop2 = tuple(c // 2 for c in crop)
    return [_planes_to_rgb(Y, Cb, Cr, crop2) for Y, Cb, Cr in frames]
