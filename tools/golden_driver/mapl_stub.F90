! Minimal MAPL/ESMF stand-ins so the reference's rrtmg_sw_rad.F90 (whose
! only MAPL usage is hierarchical timers + return-code macros,
! rrtmg_sw_rad.F90:47-52,1181-1200) links into the offline golden driver
! without the real MAPL/ESMF stack.
module ESMF
   implicit none
end module ESMF

module MAPL
   implicit none

   type :: MAPL_MetaComp
      integer :: unused = 0
   end type MAPL_MetaComp

contains

   subroutine MAPL_TimerOn(meta, name, RC)
      type(MAPL_MetaComp), pointer, intent(inout) :: meta
      character(len=*), intent(in) :: name
      integer, optional, intent(out) :: RC
      if (present(RC)) RC = 0
   end subroutine MAPL_TimerOn

   subroutine MAPL_TimerOff(meta, name, RC)
      type(MAPL_MetaComp), pointer, intent(inout) :: meta
      character(len=*), intent(in) :: name
      integer, optional, intent(out) :: RC
      if (present(RC)) RC = 0
   end subroutine MAPL_TimerOff

end module MAPL
