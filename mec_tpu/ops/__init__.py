"""Device-side kernels and host-side decoders for the audio frontend."""
