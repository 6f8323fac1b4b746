

def test_avi_roundtrip_and_validation():
    import numpy as np
    import pytest
    from kittispark.operators.multimodal import decode_avi, encode_avi_rgb

    frames, planes = [], []
    for t in range(3):
        j = np.arange(5 * 3 * 3, dtype="int64")
        rgb = ((7 + t * 31 + j * 5) % 256).astype("uint8").tobytes()
        frames.append((5, 3, rgb))
        planes.append(rgb)
    avi = encode_avi_rgb(frames)
    out = decode_avi(avi)
    assert (out["width"], out["height"]) == (5, 3)
    assert [f.tobytes() for f in out["frames"]] == planes
    # idx1 algebra: stride(5)=16, frame=48, offsets 4 + t*56
    assert out["index"] == [(4, 48), (60, 48), (116, 48)]
    with pytest.raises(ValueError):
        decode_avi(avi[:-10])
    with pytest.raises(ValueError):
        decode_avi(b"RIFF\x00\x00\x00\x00WAVE")
    # stride-free width (w*3 % 4 == 0)
    noq = encode_avi_rgb([(4, 2, bytes(range(24)))])
    assert decode_avi(noq)["frames"][0].tobytes() == bytes(range(24))
