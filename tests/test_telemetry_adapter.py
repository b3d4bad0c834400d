"""Telemetry adapter: raw FC MAVLink bytes -> Telemetry snapshots ->
behavior machine (the full input pipeline, SURVEY §3.5)."""

import math

import numpy as np

from micro_quad_slam_tpu.formats.mavlink import MavEncoder
from micro_quad_slam_tpu.golden.behavior import GoldenBehavior, ST_ARMING, ST_IDLE
from micro_quad_slam_tpu.replay.telemetry import TelemetryAdapter


def _fc_encoder():
    return MavEncoder(sysid=1, compid=1)


def _hb(enc, armed=False, mode=4):
    return enc.pack("HEARTBEAT", custom_mode=mode, type=2, autopilot=3,
                    base_mode=(0x80 if armed else 0) | 1,
                    system_status=4, mavlink_version=3)


def test_adapter_latches_basic_telemetry():
    enc = _fc_encoder()
    ad = TelemetryAdapter()
    buf = _hb(enc) + enc.pack(
        "ATTITUDE", time_boot_ms=10, roll=0.01, pitch=-0.02, yaw=math.pi / 2,
        rollspeed=0, pitchspeed=0, yawspeed=0)
    buf += enc.pack("LOCAL_POSITION_NED", time_boot_ms=10, x=1.5, y=-0.5,
                    z=-0.8, vx=0.1, vy=0.0, vz=0.0)
    buf += enc.pack("EXTENDED_SYS_STATE", vtol_state=0, landed_state=2)
    buf += enc.pack("DISTANCE_SENSOR", time_boot_ms=10, min_distance=2,
                    max_distance=400, current_distance=81, type=0, id=0,
                    orientation=25, covariance=0)
    ad.feed(buf, t_ms=1000)
    tm = ad.snapshot(1010, want_arm=False)
    assert tm.have_fc and tm.have_att and tm.have_lpos and tm.have_rf
    assert abs(tm.yaw_deg - 90.0) < 1e-4
    assert abs(tm.lpos_x - 1.5) < 1e-6
    assert abs(tm.lpos_alt_filt - 0.8) < 1e-6  # first sample adopts
    assert abs(tm.rf_m - 0.81) < 1e-6
    assert tm.landed_state == 2


def test_adapter_lpos_alt_ema_at_message_rate():
    enc = _fc_encoder()
    ad = TelemetryAdapter()
    for k, alt in enumerate((0.5, 1.0, 1.0)):
        ad.feed(enc.pack("LOCAL_POSITION_NED", time_boot_ms=k, x=0, y=0,
                         z=-alt, vx=0, vy=0, vz=0), t_ms=100 + k * 50)
    # EMA: 0.5 -> 0.5+0.18*0.5=0.59 -> 0.59+0.18*0.41=0.6638
    assert abs(ad.lpos_alt_filt - 0.6638) < 1e-4
    # insane altitude rejected (uav_local_nav.c:1172-1173)
    ad.feed(enc.pack("LOCAL_POSITION_NED", time_boot_ms=3, x=9, y=9,
                     z=-100.0, vx=0, vy=0, vz=0), t_ms=400)
    assert ad.lpos_x != 9


def test_adapter_flow_rad_rate_derivation():
    enc = _fc_encoder()
    ad = TelemetryAdapter()
    ad.feed(enc.pack("OPTICAL_FLOW_RAD", time_usec=0,
                     integration_time_us=50000, integrated_x=0.05,
                     integrated_y=-0.02, integrated_xgyro=0,
                     integrated_ygyro=0, integrated_zgyro=0,
                     time_delta_distance_us=0, distance=0.5,
                     temperature=0, sensor_id=0, quality=90), t_ms=100)
    assert abs(ad.of_rate_x - 1.0) < 1e-5     # 0.05 / 0.05 s
    assert abs(ad.of_rate_y + 0.4) < 1e-5
    assert ad.of_q == 90 and abs(ad.of_ground - 0.5) < 1e-6


def test_adapter_battery_cells_and_clean_inference():
    enc = _fc_encoder()
    fields = {f"voltage{i}": 0 for i in range(10)}
    fields.update(voltage0=3900, voltage1=3850)
    msg = enc.pack("BATTERY_STATUS", current_consumed=0, energy_consumed=0,
                   temperature=0, current_battery=0, id=0,
                   battery_function=0, type=0, battery_remaining=50,
                   **fields)
    ad = TelemetryAdapter()
    ad.feed(msg, 100)
    assert ad.batt_cells == 2 and abs(ad.batt_vpc - 3.875) < 1e-6
    # clean inference: one reading of the whole pack -> cells = 4
    fields = {f"voltage{i}": 0 for i in range(10)}
    fields.update(voltage0=15500)
    msg = enc.pack("BATTERY_STATUS", current_consumed=0, energy_consumed=0,
                   temperature=0, current_battery=0, id=0,
                   battery_function=0, type=0, battery_remaining=50,
                   **fields)
    ad2 = TelemetryAdapter(clean_battery=True)
    ad2.feed(msg, 100)
    assert ad2.batt_cells == 4 and abs(ad2.batt_vpc - 3.875) < 1e-6


def test_adapter_ack_latch_and_rcmap():
    enc = _fc_encoder()
    ad = TelemetryAdapter()
    ad.feed(enc.pack("COMMAND_ACK", command=22, result=0), 500)
    assert ad.have_takeoff_ack and ad.takeoff_accept_ms == 500
    ad.feed(enc.pack("PARAM_VALUE", param_value=5.0, param_count=900,
                     param_index=100, param_id="RCMAP_THROTTLE",
                     param_type=2), 600)
    assert ad.rcmap["RCMAP_THROTTLE"] == 5


def test_full_input_pipeline_drives_behavior():
    """FC bytes -> adapter -> golden machine: heartbeats + healthy
    telemetry let the machine progress IDLE -> ARMING on want_arm."""
    enc = _fc_encoder()
    ad = TelemetryAdapter()
    m = GoldenBehavior()
    state_trace = []
    for k in range(100):
        t = k * 20
        buf = b""
        if k % 50 == 0:
            buf += _hb(enc, armed=False)
        if k % 2 == 0:
            buf += enc.pack("ATTITUDE", time_boot_ms=t, roll=0, pitch=0,
                            yaw=0.1, rollspeed=0, pitchspeed=0, yawspeed=0)
            buf += enc.pack("LOCAL_POSITION_NED", time_boot_ms=t, x=0, y=0,
                            z=-0.02, vx=0, vy=0, vz=0)
        ad.feed(buf, t)
        tm = ad.snapshot(t, want_arm=(t >= 1000))
        out = m.step(tm)
        state_trace.append(out.state)
    assert ST_IDLE in state_trace and ST_ARMING in state_trace
