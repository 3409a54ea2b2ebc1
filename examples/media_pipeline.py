"""Runnable tour of the REAL media codecs over Spark.

    PYTHONPATH=. python examples/media_pipeline.py

Every decode below runs inside mapInPandas with codecs implemented in this
repo (no Pillow/librosa/ffmpeg in the container):

  PPM / BMP      raw numpy parsing
  PNG            stdlib zlib inflate + the five scanline filters
  GIF            variable-width LZW implemented directly
  JPEG           baseline DCT + Huffman (tables read from DHT)
  WAV            stdlib wave, 16-bit PCM
  FLAC           Rice coding + fixed/LPC predictors, lossless
  IMA ADPCM      4-bit adaptive quantizer, lossy 4:1, block-parallel
  G.711          mu-law/A-law companding, lossy 2:1, stateless/sample
  raw video      back-to-back PPM frames, every-Nth sampling
  Screen Video   FLV interframe block codec (zlib blocks + block copy)

Each section prints the extracted features; the corresponding workload
queries hash-match analytic oracles at the driver gate.
"""

from __future__ import annotations

from gohangout_spark import get_spark
from gohangout_spark.functions.flac import FlacCodec
from gohangout_spark.functions.jpeg import JpegCodec
from gohangout_spark.functions.multimodal import (
    AutoCodec,
    FlacAudioCodec,
    GifCodec,
    PngCodec,
    RawVideoCodec,
    WavPcmCodec,
    extract_audio_features,
    extract_audio_spectrum,
    extract_image_features,
    make_flac_media_table,
    make_gif_media_table,
    make_jpeg_media_table,
    make_png_media_table,
    make_ppm_media_table,
    make_rawvideo_media_table,
    make_sine_wav_media_table,
    make_wav_media_table,
    sample_video_frames,
)


def main() -> None:
    spark = get_spark("media-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")

    print("== PPM (raw) features")
    extract_image_features(
        make_ppm_media_table(spark, n=6), codec=AutoCodec()
    ).show()

    print("== PNG (DEFLATE) features")
    extract_image_features(
        make_png_media_table(spark, n=6), codec=PngCodec()
    ).show()

    print("== GIF (LZW) features")
    extract_image_features(
        make_gif_media_table(spark, n=6), codec=GifCodec()
    ).show()

    print("== JPEG (DCT+Huffman) features")
    extract_image_features(
        make_jpeg_media_table(spark, n=6), codec=JpegCodec()
    ).show()

    print("== mixed payloads through AutoCodec magic dispatch")
    mixed = (
        make_png_media_table(spark, n=3)
        .unionByName(make_gif_media_table(spark, n=3))
        .unionByName(make_jpeg_media_table(spark, n=3))
    )
    extract_image_features(mixed, codec=AutoCodec()).show()

    print("== WAV features")
    extract_audio_features(
        make_wav_media_table(spark, n=6), codec=WavPcmCodec()
    ).show()

    print("== FLAC (Rice-compressed, lossless) features")
    extract_audio_features(
        make_flac_media_table(spark, n=6), codec=FlacAudioCodec()
    ).show()

    print("== sine-clip FFT dominant bins")
    extract_audio_spectrum(make_sine_wav_media_table(spark, n=6)).show()

    print("== raw-video every-2nd-frame sampling")
    frames = sample_video_frames(
        make_rawvideo_media_table(spark, n=4), every_n=2, codec=RawVideoCodec()
    )
    frames.select("media_id", "frame_idx").show()

    print("== IMA ADPCM (lossy 4:1) decode stats")
    from gohangout_spark.functions.multimodal import (
        extract_adpcm_decode_stats,
        extract_g711_decode_stats,
        extract_video_frame_features,
        make_adpcm_media_table,
        make_g711_media_table,
        make_screenvideo_media_table,
    )

    extract_adpcm_decode_stats(
        make_adpcm_media_table(spark, n=6, block_align=20), block_align=20
    ).show()

    print("== G.711 mu-law/A-law (lossy 2:1) decode stats")
    extract_g711_decode_stats(make_g711_media_table(spark, n=6)).show()

    print("== FLV Screen Video interframe decode (per-frame means)")
    from gohangout_spark.functions.screenvideo import ScreenVideoCodec

    extract_video_frame_features(
        make_screenvideo_media_table(spark, n=4), codec=ScreenVideoCodec(16)
    ).show()

    print("compression check: FLAC vs raw PCM bytes on a tonal clip")
    import numpy as np

    t = np.arange(16000)
    tone = np.round(9000 * np.sin(2 * np.pi * 330 * t / 16000)).astype(np.int32)
    enc = FlacCodec().encode(tone)
    print(f"  raw 16-bit: {2 * len(tone)} B   flac: {len(enc)} B "
          f"({100 * len(enc) // (2 * len(tone))}%)")

    print("compression check: interframe vs all-keyframe bytes on a "
          "mostly-static clip")
    rng = np.random.RandomState(0)
    base = rng.randint(0, 256, (64, 96, 3), dtype=np.uint8)
    clip = [base]
    for j in range(9):  # one 16x16 block changes per frame
        nxt = clip[-1].copy()
        nxt[16:32, (j % 6) * 16 : (j % 6) * 16 + 16] = rng.randint(
            0, 256, (16, 16, 3), dtype=np.uint8
        )
        clip.append(nxt)
    codec = ScreenVideoCodec(16)
    inter = len(codec.encode(clip))
    allkey = sum(len(codec.encode([f])) for f in clip)
    print(f"  all-keyframes: {allkey} B   interframe: {inter} B "
          f"({100 * inter // allkey}%)")


if __name__ == "__main__":
    main()
