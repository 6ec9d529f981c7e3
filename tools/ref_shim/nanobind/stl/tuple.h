#pragma once
#include <tuple>
