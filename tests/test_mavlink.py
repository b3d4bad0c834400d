"""MAVLink v1 codec + CTRL debounce tests (vehicle-interface layer)."""

import math

import numpy as np

from micro_quad_slam_tpu.formats.mavlink import (
    CMD_COMPONENT_ARM_DISARM,
    CMD_NAV_TAKEOFF,
    FRAME_BODY_OFFSET_NED,
    MASK_POSITION,
    MASK_VELOCITY,
    MavEncoder,
    decode_mavlink_stream,
    encode_command_stream,
    x25_crc,
)
from micro_quad_slam_tpu.formats.scanframe import CtrlDebouncer


def test_x25_crc_known_vector():
    # MAVLink's accumulate is CRC-16/MCRF4XX (init 0xFFFF, no final xor):
    # check value for "123456789" is 0x6F91
    assert x25_crc(b"123456789") == 0x6F91


def test_heartbeat_roundtrip():
    enc = MavEncoder(sysid=252)
    frame = enc.heartbeat()
    assert frame[0] == 0xFE and frame[5] == 0  # HEARTBEAT msgid
    msgs = list(decode_mavlink_stream(frame))
    assert len(msgs) == 1
    name, f = msgs[0]
    assert name == "HEARTBEAT" and f["type"] == 18 and f["_sysid"] == 252


def test_command_and_setpoint_roundtrip():
    enc = MavEncoder()
    buf = (enc.arm(1, 1) + enc.takeoff(1, 1, 0.5)
           + enc.velocity_setpoint(1234, 1, 1, 0.35, 0.0, 0.0,
                                   math.radians(15.0))
           + enc.position_setpoint(1250, 1, 1, 1.0, -2.0, -0.5, 1.57)
           + enc.disarm_force(1, 1))
    msgs = list(decode_mavlink_stream(buf))
    names = [n for n, _ in msgs]
    assert names == ["COMMAND_LONG", "COMMAND_LONG",
                     "SET_POSITION_TARGET_LOCAL_NED",
                     "SET_POSITION_TARGET_LOCAL_NED", "COMMAND_LONG"]
    arm = msgs[0][1]
    assert arm["command"] == CMD_COMPONENT_ARM_DISARM and arm["param1"] == 1.0
    tko = msgs[1][1]
    assert tko["command"] == CMD_NAV_TAKEOFF
    assert abs(tko["param7"] - 0.5) < 1e-6
    vel = msgs[2][1]
    assert vel["type_mask"] == MASK_VELOCITY
    assert vel["coordinate_frame"] == FRAME_BODY_OFFSET_NED
    assert abs(vel["vx"] - 0.35) < 1e-6
    pos = msgs[3][1]
    assert pos["type_mask"] == MASK_POSITION and abs(pos["y"] + 2.0) < 1e-6
    dis = msgs[4][1]
    assert dis["param2"] == 21196.0  # force-disarm magic


def test_stream_negotiation_matches_reference_rates():
    enc = MavEncoder()
    msgs = list(decode_mavlink_stream(enc.stream_negotiation(1)))
    cl = [f for n, f in msgs if n == "COMMAND_LONG"]
    assert len(cl) == 10
    # ATTITUDE (30) at 50000 us = 20 Hz (uav_local_nav.c:1026)
    att = next(f for f in cl if f["param1"] == 30.0)
    assert att["param2"] == 50000.0
    rds = [f for n, f in msgs if n == "REQUEST_DATA_STREAM"]
    assert len(rds) == 1 and rds[0]["req_stream_id"] == 3


def test_stream_negotiation_cl_profile():
    """clean's burst: 11 intervals with RC_CHANNELS @5 Hz THIRD in the
    list, and no REQUEST_DATA_STREAM (clean_uav_fc_tof_nav.c:1106-1124)."""
    enc = MavEncoder()
    msgs = list(decode_mavlink_stream(enc.stream_negotiation(1, "cl")))
    cl = [f for n, f in msgs if n == "COMMAND_LONG"]
    assert len(cl) == 11 and len(msgs) == 11  # no REQUEST_DATA_STREAM
    order = [int(f["param1"]) for f in cl]
    assert order == [1, 36, 65, 147, 132, 245, 30, 32, 100, 106, 173]
    rc = cl[2]
    assert rc["param1"] == 65.0 and rc["param2"] == 200000.0  # 5 Hz


def test_esc_status_roundtrip_and_crc_extra():
    """ESC_STATUS (msgid 291, clean's 18th handler clean:1525): wire
    roundtrip in both framings, and the CRC_EXTRA recomputed from the
    dialect recipe (x25 over name + sorted 'ctype name' fields + array
    length bytes, folded hi^lo) equals the packed value — the recipe is
    cross-checked against HEARTBEAT/ATTITUDE/VIBRATION."""
    from micro_quad_slam_tpu.formats.mavlink import _MSGS

    def crc_extra(name, fields):
        s = name + " "
        for t, fn, al in fields:
            s += t + " " + fn + " "
            if al:
                s += chr(al)
        c = x25_crc(s.encode())
        return (c & 0xFF) ^ (c >> 8)

    assert crc_extra("HEARTBEAT", [
        ("uint32_t", "custom_mode", 0), ("uint8_t", "type", 0),
        ("uint8_t", "autopilot", 0), ("uint8_t", "base_mode", 0),
        ("uint8_t", "system_status", 0),
        ("uint8_t", "mavlink_version", 0)]) == _MSGS["HEARTBEAT"][1]
    assert crc_extra("VIBRATION", [
        ("uint64_t", "time_usec", 0), ("float", "vibration_x", 0),
        ("float", "vibration_y", 0), ("float", "vibration_z", 0),
        ("uint32_t", "clipping_0", 0), ("uint32_t", "clipping_1", 0),
        ("uint32_t", "clipping_2", 0)]) == _MSGS["VIBRATION"][1]
    assert crc_extra("ESC_STATUS", [
        ("uint64_t", "time_usec", 0), ("int32_t", "rpm", 4),
        ("float", "voltage", 4), ("float", "current", 4),
        ("uint8_t", "index", 0)]) == _MSGS["ESC_STATUS"][1] == 10

    # msgid 291 > 255: a MAVLink-v2-only message — v1 framing refuses
    import pytest
    with pytest.raises(ValueError, match="v2"):
        MavEncoder(version=1).pack("ESC_STATUS", time_usec=0)
    enc = MavEncoder(sysid=1, compid=1, version=2)
    buf = enc.pack("ESC_STATUS", time_usec=123456, index=0,
                   rpm0=8100, rpm1=-8200, rpm2=8300, rpm3=8400,
                   voltage0=3.9, current0=1.5)
    msgs = list(decode_mavlink_stream(buf))
    assert len(msgs) == 1
    name, f = msgs[0]
    assert name == "ESC_STATUS"
    assert [f[f"rpm{i}"] for i in range(4)] == [8100, -8200, 8300, 8400]
    assert abs(f["voltage0"] - 3.9) < 1e-6


def test_corrupt_frame_resync():
    enc = MavEncoder()
    a = bytearray(enc.heartbeat())
    b = enc.arm(1, 1)
    a[7] ^= 0xFF  # corrupt payload -> CRC fails
    msgs = list(decode_mavlink_stream(bytes(a) + b))
    assert [n for n, _ in msgs] == ["COMMAND_LONG"]


def test_encode_command_stream_from_behavior_outputs():
    enc = MavEncoder()
    out = {"req_mode": 4, "req_arm": 1, "req_takeoff": 0.5,
           "cmd_kind": 1, "cmd": (0.35, 0.0, 0.0, 12.0),
           "rc_release": True}
    buf = encode_command_stream(enc, 5000, out, heartbeat_due=True)
    names = [n for n, _ in decode_mavlink_stream(buf)]
    assert names == ["HEARTBEAT", "SET_MODE", "COMMAND_LONG",  # DO_SET_MODE
                     "COMMAND_LONG",  # arm
                     "COMMAND_LONG",  # takeoff
                     "SET_POSITION_TARGET_LOCAL_NED",
                     "RC_CHANNELS_OVERRIDE"]


def test_rcmap_request_param_ids():
    enc = MavEncoder()
    msgs = list(decode_mavlink_stream(enc.rcmap_requests(1, 1)))
    ids = [f["param_id"].rstrip(b"\x00").decode() for _, f in msgs]
    assert ids == ["RCMAP_ROLL", "RCMAP_PITCH", "RCMAP_THROTTLE",
                   "RCMAP_YAW"]


def test_ctrl_debouncer():
    d = CtrlDebouncer()
    assert d.feed(1, 5, 100) is True            # ARM immediate
    assert d.feed(0, 10, 200) is None           # first DISARM pending
    assert d.feed(0, 11, 300) is False          # consecutive seq confirms
    # spurious lone DISARM never confirms
    assert d.feed(0, 50, 1000) is None
    assert d.feed(0, 999, 1100) is None         # wrong seq -> new window
    assert d.feed(0, 1000, 1200) is False       # then a real streak works
    # window expiry resets the streak
    assert d.feed(0, 7, 5000) is None
    assert d.feed(0, 8, 5600) is None           # 600 ms later: new window


def test_arm_remote_hold_and_tap():
    from micro_quad_slam_tpu.formats.armlink import (
        ArmRemote, decode_arm_msg)

    r = ArmRemote()
    assert r.press(0) is None
    assert r.tick(400) is None            # not held long enough
    msg = r.tick(700)                     # 650 ms hold -> ARM
    m = decode_arm_msg(msg)
    assert m == {"cmd": 1, "seq": 1, "t_ms": 700}
    assert r.release(800) is None         # already fired
    # tap while armed -> DISARM
    assert r.press(2000) is None
    msg = r.release(2100)
    assert decode_arm_msg(msg)["cmd"] == 0
    # rejects garbage
    assert decode_arm_msg(b"\x00" * 10) is None
    assert decode_arm_msg(b"\xc3\x05" + b"\x00" * 8) is None
    assert decode_arm_msg(b"short") is None


# ----------------------------- MAVLink v2 --------------------------------

def test_v2_roundtrip_all_message_types():
    """Every message in the codec table roundtrips through v2 framing
    (0xFD, 3-byte msgid, trailing-zero truncation) with fields equal to
    the v1 decode (uav_local_nav.c:48,1263-1297 accepts both)."""
    import struct as _struct
    from micro_quad_slam_tpu.formats.mavlink import _MSGS

    rng = np.random.default_rng(3)
    enc1 = MavEncoder(sysid=7, compid=1, version=1)
    enc2 = MavEncoder(sysid=7, compid=1, version=2)
    for name, (msgid, _, fmt, names) in _MSGS.items():
        # expand repeat counts: "<Q4i..." -> "Qiiii..."
        chars = []
        rep = ""
        for ch in fmt.lstrip("<"):
            if ch.isdigit():
                rep += ch
            elif ch == "s":
                chars.append("s")   # byte string consumes the count
                rep = ""
            else:
                chars.extend([ch] * int(rep or "1"))
                rep = ""
        fields = {}
        for n, ch in zip(names, chars):
            if ch == "s":
                fields[n] = "x"
            elif ch == "f":
                fields[n] = float(np.float32(rng.uniform(-3, 3)))
            else:
                fields[n] = int(rng.integers(0, 100))
        f2 = enc2.pack(name, **fields)
        assert f2[0] == 0xFD
        (n2, d2), = decode_mavlink_stream(f2)
        assert n2 == name
        if msgid > 0xFF:
            continue  # v2-only message (ESC_STATUS)
        f1 = enc1.pack(name, **fields)
        assert len(f2) <= len(f1) + 4  # truncation never inflates much
        (n1, d1), = decode_mavlink_stream(f1)
        assert n1 == name
        d1.pop("_seq"), d2.pop("_seq")
        assert d1 == d2, name


def test_v2_trailing_zero_truncation():
    """A payload ending in zeros is shorter on the wire in v2 and
    zero-extends back on decode."""
    enc = MavEncoder(version=2)
    # COMMAND_LONG with all-zero tail: only param1 nonzero
    frame = enc.pack("COMMAND_LONG", param1=1.0, command=0)
    full = 33  # v1 payload size of COMMAND_LONG
    assert len(frame) < 10 + full + 2
    (name, f), = decode_mavlink_stream(frame)
    assert name == "COMMAND_LONG"
    assert f["param1"] == 1.0 and f["command"] == 0 and f["param7"] == 0.0


def test_mixed_v1_v2_stream_decodes_in_order():
    enc1 = MavEncoder(sysid=1, compid=1, version=1)
    enc2 = MavEncoder(sysid=1, compid=1, version=2)
    buf = (enc1.heartbeat() + enc2.pack("ATTITUDE", time_boot_ms=5, yaw=1.0)
           + enc1.arm(1, 1)
           + enc2.pack("RANGEFINDER", distance=0.42, voltage=3.3))
    names = [n for n, _ in decode_mavlink_stream(buf)]
    assert names == ["HEARTBEAT", "ATTITUDE", "COMMAND_LONG", "RANGEFINDER"]


def test_v2_signed_frame_signature_skipped():
    """A signed v2 frame (incompat bit 0) is accepted and its 13-byte
    signature is skipped so the next frame still decodes."""
    import struct as _struct
    from micro_quad_slam_tpu.formats.mavlink import x25_crc, _MSGS

    enc = MavEncoder(sysid=1, compid=1, version=2)
    frame = bytearray(enc.pack("ATTITUDE", time_boot_ms=9, yaw=0.5))
    frame[2] |= 0x01  # set MAVLINK_IFLAG_SIGNED
    crc_extra = _MSGS["ATTITUDE"][1]
    body = bytes(frame[1:-2])
    frame[-2:] = _struct.pack("<H", x25_crc(body + bytes([crc_extra])))
    signed = bytes(frame) + b"\x5a" * 13
    buf = signed + enc.pack("RANGEFINDER", distance=1.0, voltage=0.1)
    msgs = list(decode_mavlink_stream(buf))
    assert [n for n, _ in msgs] == ["ATTITUDE", "RANGEFINDER"]
    assert msgs[0][1]["time_boot_ms"] == 9


def test_v2_corrupt_frame_resync():
    enc = MavEncoder(version=2)
    a = bytearray(enc.pack("ATTITUDE", time_boot_ms=1, yaw=1.0))
    a[11] ^= 0xFF
    b = enc.pack("RANGEFINDER", distance=2.0, voltage=0.0)
    msgs = list(decode_mavlink_stream(bytes(a) + b))
    assert [n for n, _ in msgs] == ["RANGEFINDER"]
