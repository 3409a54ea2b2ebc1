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
  raw video      back-to-back PPM frames, every-Nth sampling

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

    print("compression check: FLAC vs raw PCM bytes on a tonal clip")
    import numpy as np

    t = np.arange(16000)
    tone = np.round(9000 * np.sin(2 * np.pi * 330 * t / 16000)).astype(np.int32)
    enc = FlacCodec().encode(tone)
    print(f"  raw 16-bit: {2 * len(tone)} B   flac: {len(enc)} B "
          f"({100 * len(enc) // (2 * len(tone))}%)")


if __name__ == "__main__":
    main()
