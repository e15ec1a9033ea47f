"""Differentiable denoiser stack — the in-repo NRD equivalent (SURVEY.md §2.3):
REBLUR (recurrent blur), RELAX (SVGF-family à-trous), SIGMA (shadows),
REFERENCE (temporal accumulation), TAA, composition, confidence blur.

All denoisers are pure functions (image in, image out) over an explicit history
pytree; temporal recurrence is stop-gradient'd by default (SURVEY.md §7.3.4)."""
