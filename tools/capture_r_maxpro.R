# Capture fixture: R MaxPro designs for LHD-quality comparison.
#
# The build environment has no R (and no network), so the native SA
# generator's quality vs the reference's R MaxPro output
# (/root/reference/src/design.py:65-74) is pinned by this offline
# protocol: run on any machine with R + the MaxPro package,
#
#   Rscript tools/capture_r_maxpro.R > tests/fixtures/r_maxpro_designs.txt
#
# then commit the file; tests/test_design.py's skip-gated comparison
# activates automatically and asserts the native generator achieves a
# MaxPro criterion within a bounded factor of R's on the same
# (npoints, ndim) grid.  Seeds/sizes mirror the reference call exactly:
# MaxProRunOrder(MaxProLHD(npoints, ndim)$Design)$Design.
library(MaxPro)
for (cfg in list(c(40, 3, 42), c(100, 5, 42), c(250, 17, 42))) {
  npoints <- cfg[1]; ndim <- cfg[2]; seed <- cfg[3]
  set.seed(seed)
  d <- MaxProRunOrder(MaxProLHD(npoints, ndim)$Design)$Design
  cat(sprintf("# design npoints=%d ndim=%d seed=%d\n", npoints, ndim, seed))
  write.table(d, col.names = FALSE, row.names = FALSE)
}
