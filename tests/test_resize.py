"""resize_media: the real nearest-neighbor kernel over every native
pixel decoder (PNG, GIF, baseline JPEG), with a pure-Python referee."""

import pandas as pd


def _expected_nn_sum(pix, w, h, tw, th):
    # pix[r][c]; floor source mapping, channel-agnostic (grayscale here)
    return sum(
        pix[(y * h) // th][(x * w) // tw]
        for y in range(th)
        for x in range(tw)
    )


def test_resize_media_cross_format_and_clamp(spark):
    from ohsome_planet_spark.functions.gif import encode_gif
    from ohsome_planet_spark.functions.jpeg import decode_jpeg, encode_jpeg
    from ohsome_planet_spark.functions.png import encode_png
    from ohsome_planet_spark.operators.multimodal import resize_media

    w, h = 12, 10
    pix = [[(r * 7 + c * 13) % 256 for c in range(w)] for r in range(h)]
    rows = [bytes(pr) for pr in pix]

    png = encode_png(w, h, rows)
    pal = [(i, i, i) for i in range(256)]  # identity-gray palette
    gif = encode_gif(w, h, pal[:256], [pix[r][c] for r in range(h) for c in range(w)])
    # flat 8x8 blocks so baseline JPEG round-trips bit-exactly
    jw, jh = 16, 8
    jrows = [bytes(((c // 8) * 50 + (r // 8) * 30) % 256 for c in range(jw))
             for r in range(jh)]
    jpg = encode_jpeg(jw, jh, jrows, channels=1, quant=1)
    jpix = decode_jpeg(jpg)[3]

    df = spark.createDataFrame(
        pd.DataFrame({
            "media_id": [1, 2, 3, 4, 5],
            "media": [png, gif, jpg, b"not media", png],
            "ms": [5, 5, 6, 5, 999],
        }),
        "media_id bigint, media binary, ms int",
    )
    out = {r["media_id"]: r.asDict() for r in
           resize_media(df, max_side_col="ms").collect()}

    # PNG grayscale 12x10 -> max_side 5: tw=5, th=5 (ceil(10*5/12)=5)
    assert (out[1]["target_width"], out[1]["target_height"]) == (5, 5)
    assert out[1]["resized_pixel_sum"] == _expected_nn_sum(pix, w, h, 5, 5)
    # GIF decodes to RGB with an identity-gray palette: 3x the gray sum
    assert (out[2]["target_width"], out[2]["target_height"]) == (5, 5)
    assert out[2]["resized_pixel_sum"] == 3 * _expected_nn_sum(pix, w, h, 5, 5)
    # JPEG 16x8 -> max_side 6: tw=6, th=3
    assert (out[3]["target_width"], out[3]["target_height"]) == (6, 3)
    jexp = sum(
        jpix[(y * jh) // 3][(x * jw) // 6] for y in range(3) for x in range(6)
    )
    assert out[3]["resized_pixel_sum"] == jexp
    # undecodable payload nulls out
    assert out[4]["resized_pixel_sum"] is None and out[4]["width"] is None
    # never upscale: budget larger than the image keeps dims
    assert (out[5]["target_width"], out[5]["target_height"]) == (w, h)
    assert out[5]["resized_pixel_sum"] == sum(sum(r) for r in pix)
