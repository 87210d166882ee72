#pragma once
namespace boost { namespace assign {}}
