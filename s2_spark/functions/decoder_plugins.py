"""Optional bring-your-own-codec plugins for the video frame path.

The engine decodes uncompressed ``raw `` RGB24 and motion-JPEG MP4
tracks natively (pure numpy, :mod:`s2_spark.functions.jpeg`); the
inter-frame codecs (H.264/H.265/VP9/AV1) are an honest boundary —
``decode_raw_mp4_frame`` raises ``NotImplementedError`` unless a
decoder is registered through the tested ``register_decoder`` seam
(multimodal.py). This module is the EXAMPLE plugin the seam was built
for: it adapts PyAV (the public FFmpeg binding, ``pip install av``;
not shipped in this container) to the seam's
``fn(payload, sample, ts_ms, width, height) -> (H, W, 3) uint8``
contract.

Mirrors the reference's stance that video decode is delegated to a
codec library rather than reimplemented; the engine owns the demux,
schema, partitioning, and Arrow plumbing (all covered by
tests/test_functions.py's fake-plugin e2e), the plugin owns only
pixels.

Spark rule for plugins (same as any task-closure callable): the
registered function is SNAPSHOTTED into the task closure at
plan-build time, so it must be picklable and its imports must resolve
on executor Python workers — install the codec library on every
worker image, not just the driver.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from s2_spark.functions.multimodal import register_decoder

#: fourccs FFmpeg decodes that this adapter claims by default: the two
#: H.264 sample-entry names and the two H.265 ones (in-band vs
#: out-of-band parameter sets).
DEFAULT_FOURCCS = (b"avc1", b"avc3", b"hvc1", b"hev1")


def pyav_frame_decoder(av_module=None, seek: bool = False) -> Callable:
    """Build a seam-shaped decoder backed by PyAV.

    The decoder is STATEFUL-inter-frame correct: it ignores the
    pre-demuxed access unit (``sample``) and runs FFmpeg's own demux
    over the whole container payload, decoding up to the frame
    covering ``ts_ms`` — reference frames ahead of the target are
    therefore always available. By default it decodes from the start
    of the stream (always correct); ``seek=True`` first asks the
    library to seek BACKWARD to the nearest keyframe at/before the
    target (``container.seek`` in stream time-base units), so a deep
    timestamp costs one GOP of decoding instead of the whole prefix —
    the right mode for long videos with sparse sample grids.
    Correctness is unchanged: backward keyframe seek + forward decode
    reaches the same covering frame.

    ``av_module`` injects the library (tests pass a fake); ``None``
    imports the real PyAV and raises a guided ``ImportError`` when it
    is not installed.
    """
    if av_module is None:
        try:
            import av as av_module  # type: ignore[no-redef]
        except ImportError as e:
            raise ImportError(
                "the PyAV example plugin needs the public 'av' package "
                "(pip install av) on the driver AND every executor "
                "worker image; this container ships without codec "
                "libraries — see register_decoder for the plugin "
                "contract if you bring a different library"
            ) from e
    av = av_module

    def _decode(payload, sample, ts_ms, width, height):
        import io

        import numpy as np

        target = ts_ms / 1000.0
        with av.open(io.BytesIO(payload)) as container:
            stream = next(
                s for s in container.streams if s.type == "video"
            )
            if seek:
                tb = getattr(stream, "time_base", None)
                if tb:
                    container.seek(
                        int(target / float(tb)), stream=stream, backward=True
                    )
            best = None
            for frame in container.decode(stream):
                t = frame.time
                if t is None:
                    continue
                if best is None or t <= target:
                    best = frame
                if t >= target:
                    break
            if best is None:
                raise ValueError(
                    f"no decodable video frame at {ts_ms} ms"
                )
            arr = best.to_ndarray(format="rgb24")
            return np.ascontiguousarray(arr, dtype=np.uint8)

    return _decode


def install_pyav(
    fourccs: Iterable[bytes | str] = DEFAULT_FOURCCS,
    av_module=None,
    seek: bool = False,
) -> list[bytes]:
    """Register the PyAV adapter for every fourcc in ``fourccs`` and
    return the normalized keys that were claimed. Call on the driver
    BEFORE building plans (registration is snapshotted per plan).
    ``seek=True`` enables keyframe seeking for long videos."""
    fn = pyav_frame_decoder(av_module=av_module, seek=seek)
    claimed = []
    for fc in fourccs:
        register_decoder(fc, fn)
        claimed.append(
            (fc.encode() if isinstance(fc, str) else fc).ljust(4)[:4]
        )
    return claimed
