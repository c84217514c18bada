from rendernet_tpu.utils.image import decode_image, encode_png, save_image, to_uint8

__all__ = ["decode_image", "encode_png", "save_image", "to_uint8"]
