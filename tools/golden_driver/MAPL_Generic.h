! Stub of MAPL's macro header: just enough for the reference's
! rrtmg_sw_rad.F90 (__RC__ / _RETURN / _ASSERT / _FAIL) to compile
! outside the GEOS build tree.
#define _SUCCESS 0
#define _FAILURE 1
#define __RC__ RC=STATUS
#define _RC RC=STATUS
#define _STAT STAT=STATUS
#define _VERIFY(x) if ((x) /= 0) stop 9
#define _RETURN(x) if (present(RC)) RC = x; return
#define _ASSERT(cond, msg) if (.not. (cond)) then; print *, msg; stop 9; end if
#define _FAIL(msg) print *, msg; stop 9
