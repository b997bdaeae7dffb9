"""Reference-compatible preprocessing facade.

Import-path parity with the reference `preprocessing` package so user code
written against it drops in unchanged:

    from mec_tpu.preprocessing.audio_preprocessing import preprocess_audio
    from mec_tpu.preprocessing.text_preprocessing import TextPreprocessor
    from mec_tpu.preprocessing.image_preprocessing import preprocess_image

Under the hood everything routes to the batched TPU kernels.
"""
