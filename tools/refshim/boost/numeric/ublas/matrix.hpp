// shim: see tools/refshim/ublas_core.hpp
#pragma once
#include "../../../ublas_core.hpp"
