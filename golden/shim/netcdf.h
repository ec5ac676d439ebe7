#pragma once
/* Shim header: satisfies the `#include "netcdf.h"` in the reference's
 * include/ggl.h when building the golden-trajectory driver.  The driver
 * never calls any nc_* function (all data arrives through the tagged
 * binary input file), so an empty header is sufficient. */
