"""Grapheme-to-phoneme module (reference Sources/MLXAudioG2P)."""
