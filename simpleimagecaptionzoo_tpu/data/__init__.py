from simpleimagecaptionzoo_tpu.data.caption_data import CaptionData  # noqa: F401
