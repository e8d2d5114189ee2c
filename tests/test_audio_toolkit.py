"""Audio toolkit: load/split/SRT-split/delay/concat round-trips
(nodes.py:426-964, GeneralVideoNodes2.py:29-866 behavior)."""

import os
import struct
import wave

import numpy as np
import pytest

from vrgdg_tpu.runtime import audio_toolkit as at


def sine_audio(seconds=4.0, sr=22050, channels=2, freq=440.0):
    t = np.arange(int(seconds * sr)) / sr
    mono = (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    return at.make_audio(np.tile(mono, (1, channels, 1)), sr)


def write_wav(path, audio, bits=16):
    return at.save_wav(path, audio, bits)


def test_wav_roundtrip_and_load_window(tmp_path):
    src = sine_audio(3.0, sr=8000)
    path = str(tmp_path / "tone.wav")
    write_wav(path, src)
    loaded = at.load_audio(path)
    assert loaded["sample_rate"] == 8000
    assert loaded["waveform"].shape == (1, 2, 24000)
    np.testing.assert_allclose(loaded["waveform"], src["waveform"],
                               atol=1e-3)
    # offset + duration window
    window = at.load_audio(path, offset=1.0, duration=0.5)
    assert window["waveform"].shape[-1] == 4000
    np.testing.assert_allclose(window["waveform"],
                               src["waveform"][..., 8000:12000], atol=1e-3)


def test_decode_wav_formats(tmp_path):
    """PCM 24/32-bit and float32 WAVs decode (beyond stdlib wave)."""
    sr, t = 8000, np.arange(800)
    mono = (0.25 * np.sin(2 * np.pi * 100 * t / sr)).astype(np.float32)

    def riff(path, fmt_code, bits, payload):
        data_size = len(payload)
        with open(path, "wb") as fh:
            fh.write(b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE")
            fh.write(b"fmt " + struct.pack("<IHHIIHH", 16, fmt_code, 1,
                                           sr, sr * bits // 8, bits // 8,
                                           bits))
            fh.write(b"data" + struct.pack("<I", data_size) + payload)

    p24 = str(tmp_path / "t24.wav")
    as_int = np.clip((mono * 8388607).round(), -8388608, 8388607) \
        .astype(np.int64)
    payload = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little")
                       for v in as_int)
    riff(p24, 1, 24, payload)
    wave24, rate = at.decode_audio_file(p24)
    assert rate == sr
    np.testing.assert_allclose(wave24[0], mono, atol=2e-7)

    pf = str(tmp_path / "tf32.wav")
    riff(pf, 3, 32, mono.astype("<f4").tobytes())
    wavef, rate = at.decode_audio_file(pf)
    np.testing.assert_allclose(wavef[0], mono, atol=1e-7)

    p32 = str(tmp_path / "t32.wav")
    riff(p32, 1, 32, (mono * 2147483647).astype("<i4").tobytes())
    wave32, _ = at.decode_audio_file(p32)
    np.testing.assert_allclose(wave32[0], mono, atol=1e-6)


def test_mono_to_stereo_and_channel_guard(tmp_path):
    mono = at.make_audio(np.zeros((1, 1, 100), np.float32), 8000)
    path = str(tmp_path / "mono.wav")
    write_wav(path, mono)
    loaded = at.load_audio(path)
    assert loaded["waveform"].shape[1] == 2  # duplicated to stereo
    five = at.make_audio(np.zeros((1, 5, 10), np.float32), 8000)
    p5 = str(tmp_path / "five.wav")
    write_wav(p5, five)
    with pytest.raises(ValueError, match="channel count"):
        at.load_audio(p5)
    assert at.load_audio(p5, make_stereo=False)["waveform"].shape[1] == 5


def test_split_by_durations_and_padding():
    audio = sine_audio(10.0, sr=8000)
    result = at.split_audio_by_durations(audio, [2.0, 3.0, 4.0],
                                         offset_seconds=0.5)
    assert result["meta"]["starts"] == [0.5, 2.5, 5.5]
    assert abs(result["total_duration"] - 10.0) < 1e-6
    lengths = [s["waveform"].shape[-1] for s in result["segments"]]
    assert lengths == [16000, 24000, 32000]
    np.testing.assert_array_equal(
        result["segments"][0]["waveform"],
        audio["waveform"][..., 4000:20000])
    # InfiniteTalk padding: every segment exactly 8 s, tail zero-padded
    padded = at.split_audio_by_durations(audio, [3.0, 3.0, 3.0],
                                         pad_to_chunk=True)
    for segment in padded["segments"]:
        assert segment["waveform"].shape[-1] == 8 * 8000
    tail = padded["segments"][2]["waveform"]
    assert np.all(tail[..., -8000:] == 0.0)  # only 4 s of real audio left


def test_parse_srt_and_final_scene_extension(tmp_path):
    srt = ("1\n00:00:00,000 --> 00:00:02,500\nSCENE 1\n\n"
           "2\n00:00:02,500 --> 00:00:05,000\nSCENE 2\n")
    path = str(tmp_path / "cues.srt")
    with open(path, "w") as fh:
        fh.write(srt)
    assert at.parse_srt(path) == [(0.0, 2.5), (2.5, 5.0)]
    assert at.parse_srt(srt) == [(0.0, 2.5), (2.5, 5.0)]
    with pytest.raises(ValueError, match="SRT"):
        at.parse_srt("not\nan srt")
    audio = sine_audio(7.0, sr=8000)
    segments = at.srt_segments_for_audio(audio, srt)
    assert segments[-1] == (2.5, 7.0)  # extended to the audio end
    fixed = at.srt_segments_for_audio(audio, fixed_duration=3.0)
    assert fixed == [(0.0, 3.0), (3.0, 6.0), (6.0, 7.0)]


def test_split_audio_srt_frame_locking():
    sr = 22050
    audio = sine_audio(10.0, sr=sr)
    srt = ("1\n00:00:00,000 --> 00:00:03,000\nA\n\n"
           "2\n00:00:03,000 --> 00:00:07,000\nB\n")
    out = at.split_audio_srt(audio, 1, srt_source=srt, fps=24,
                             tail_loss_frames=5, pre_frames=4)
    # scene 2: frames 72..240 -> 168 frames + 4 pre + 5 tail = 177 -> 177
    assert out["frames_per_scene"] == 240 - 72
    assert out["preroll_frames"] == 4
    assert out["frames_for_ltx"] == at.round_up_8n1(168 + 4 + 5)
    assert out["sample_rate"] == 44100
    expected = int(round(out["frames_for_ltx"] * 44100 / 24))
    assert out["audio"]["waveform"].shape[-1] == expected
    assert out["start_time"] == "3.000" and out["end_time"] == "10.000"
    # chunk 0 starting at zero gets no preroll
    first = at.split_audio_srt(audio, 0, srt_source=srt, fps=24,
                               pre_frames=6, tail_loss_frames=0)
    assert first["preroll_frames"] == 0
    with pytest.raises(ValueError, match="out of range"):
        at.split_audio_srt(audio, 5, srt_source=srt)


def test_round_up_8n1():
    assert [at.round_up_8n1(n) for n in (1, 2, 9, 10, 168, 177)] == \
        [1, 9, 9, 17, 169, 177]


def test_delay_by_index():
    audio = sine_audio(1.0, sr=8000)
    same = at.delay_audio_by_index(audio, 0, 40.0)
    assert same["waveform"].shape == audio["waveform"].shape
    delayed = at.delay_audio_by_index(audio, 3, 40.0)
    pad = int(round(40.0 * 8000 / 1000))
    assert delayed["waveform"].shape[-1] == 8000 + pad
    assert np.all(delayed["waveform"][..., :pad] == 0.0)
    trimmed = at.delay_audio_by_index(audio, 3, -25.0)
    assert trimmed["waveform"].shape[-1] == 8000 - 200


def test_concat_and_resample():
    a = sine_audio(1.0, sr=8000)
    b = sine_audio(0.5, sr=8000)
    joined = at.concat_audio([a, b])
    assert joined["waveform"].shape[-1] == 12000
    resampled = at.resample_waveform(a["waveform"], 8000, 16000)
    assert resampled.shape[-1] == 16000
    # a pure tone survives polyphase resampling (interior, away from edges)
    t = np.arange(16000) / 16000
    expect = 0.5 * np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    err = np.abs(resampled[0, 0, 2000:-2000] - expect[2000:-2000]).max()
    assert err < 0.01


def test_peaks_from_float_wav(tmp_path):
    """read_audio_peaks handles non-16-bit media via the toolkit."""
    from vrgdg_tpu.runtime import audio as audio_rt

    sr = 8000
    mono = np.zeros(sr, np.float32)
    mono[sr // 2] = 0.8  # single spike
    path = str(tmp_path / "spike.wav")
    with open(path, "wb") as fh:
        payload = mono.astype("<f4").tobytes()
        fh.write(b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE")
        fh.write(b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, sr, sr * 4,
                                       4, 32))
        fh.write(b"data" + struct.pack("<I", len(payload)) + payload)
    info = audio_rt.read_audio_peaks(path, target_peaks=100)
    assert info["sample_rate"] == sr and abs(info["duration"] - 1.0) < 1e-6
    assert max(info["peaks"]) == pytest.approx(0.8, abs=1e-3)
    # 16-bit files still take the fast path
    with wave.open(str(tmp_path / "s16.wav"), "wb") as handle:
        handle.setnchannels(1)
        handle.setsampwidth(2)
        handle.setframerate(sr)
        handle.writeframes((mono * 32767).astype("<i2").tobytes())
    info16 = audio_rt.read_audio_peaks(str(tmp_path / "s16.wav"),
                                       target_peaks=100)
    assert max(info16["peaks"]) == pytest.approx(0.8, abs=1e-3)


class TestHumoAudioHelpers:
    """Timecode/crop/clean/set math (HumoAutomation.py:177-365, 734-820,
    2472-2545)."""

    def test_parse_and_format_timecode(self):
        assert at.parse_timecode("1:30") == 90.0
        assert at.parse_timecode("2:05.5") == 125.5
        assert at.parse_timecode("45") == 45.0  # bare seconds
        assert at.parse_timecode(12.25) == 12.25
        assert at.format_timecode(62.08) == "1:02.08"
        assert at.format_timecode(5.0, decimals=0) == "0:05"

    def test_set_start_timecode(self):
        # one set = 16 x 97 frames @ 25 fps = 62.08 s
        assert at.set_start_timecode(0) == "0:00.00"
        assert at.set_start_timecode(1) == "1:02.08"
        assert at.set_start_timecode(2) == "2:04.16"

    def test_crop_audio(self):
        sr = 1000
        audio = at.make_audio(
            np.arange(10 * sr, dtype=np.float32)[None, None] / (10 * sr), sr)
        out = at.crop_audio(audio, "0:02", "0:05")
        assert out["waveform"].shape[-1] == 3 * sr
        np.testing.assert_allclose(out["waveform"][0, 0, 0], 0.2, atol=1e-6)
        with pytest.raises(ValueError, match="before"):
            at.crop_audio(audio, "0:06", "0:03")

    def test_clean_audio_contract(self):
        sr = 22050
        mono = np.sin(np.linspace(0, 100, sr * 2 + 137)).astype(np.float32)
        out = at.clean_audio(at.make_audio(mono[None, None], sr))
        wave, rate = out["waveform"], out["sample_rate"]
        assert rate == 48000
        assert wave.shape[1] == 2  # stereo
        assert wave.shape[-1] % 1920 == 0  # 25 fps frame aligned
        # quantized to the 16-bit grid
        grid = np.round(wave * 32767.0)
        np.testing.assert_allclose(wave, grid / 32767.0, atol=1e-7)

    def test_calculate_sets(self):
        sr = 100

        def seconds(n):
            return at.make_audio(np.zeros((1, 1, int(n * sr)), np.float32),
                                 sr)

        exact = at.calculate_sets(seconds(124.0))
        assert exact["total_sets"] == 2
        assert exact["groups_in_last_set"] == 16
        partial = at.calculate_sets(seconds(70.0))  # 62 + 8 s remainder
        assert partial["total_sets"] == 2
        assert partial["groups_in_last_set"] == 3  # ceil(8 / 3.88)
        assert partial["end_time"] == "1:10"
        short = at.calculate_sets(seconds(10.0))
        assert short["total_sets"] == 1
        assert short["groups_in_last_set"] == 3


def test_clean_audio_truncates_like_torch_short():
    # torch's .short() truncates toward zero (reference quantizer);
    # round-to-nearest would flip this sample to the next level down.
    sr = 48000
    value = -32766.6 / 32767.0
    audio = at.make_audio(np.full((1, 2, 1920), value, np.float32), sr)
    out = at.clean_audio(audio)
    np.testing.assert_allclose(out["waveform"], -32766.0 / 32767.0,
                               atol=1e-9)
